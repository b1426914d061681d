#!/usr/bin/env python
"""End-to-end dress rehearsal on a disk corpus (VERDICT r1 item 7).

Exercises the exact path a real LibriSpeech corpus takes, as ONE command:

  1. writes a mini corpus in the standard on-disk layout
     (<root>/LibriSpeech/<split>/<spk>/<chap>/*.flac + *.trans.txt),
     FLAC-encoded with the framework's own writer, transcripts drawn
     from the synthetic tone-corpus generator (the audio genuinely
     encodes the text, so training really learns)
  2. runs `python train.py --data_root <corpus> ...` (subprocess — the
     real CLI surface, reference train.py:15-265 parity path)
  3. runs `python inference.py --decode lexicon_beam ...` over the test
     split (reference inference.py:18-233 path incl. the native
     lexicon-trie beam + per-exit WER)
  4. parses the per-exit WER lines and prints one JSON summary

Usage:
  python tools/dress_rehearsal.py                 # moderate run
  python tools/dress_rehearsal.py --fast          # CI-sized smoke
  python tools/dress_rehearsal.py --workdir /tmp/dr --epochs 8
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_corpus(root: str, split: str, n_items: int, seed: int) -> None:
    from early_exit_tpu.data.flac import write_flac_verbatim
    from early_exit_tpu.data.librispeech import SyntheticDataset

    ds = SyntheticDataset(n_items=n_items, seed=seed, min_words=2,
                          max_words=6)
    per_chapter = 8
    for i in range(n_items):
        utt = ds[i]
        spk, chap = "1001", f"{i // per_chapter:04d}"
        cdir = os.path.join(root, "LibriSpeech", split, spk, chap)
        os.makedirs(cdir, exist_ok=True)
        stem = f"{spk}-{chap}-{i % per_chapter:04d}"
        write_flac_verbatim(os.path.join(cdir, stem + ".flac"),
                            utt.waveform, utt.sample_rate)
        with open(os.path.join(cdir, f"{spk}-{chap}.trans.txt"), "a",
                  encoding="utf-8") as f:
            f.write(f"{stem} {utt.transcript}\n")


def run(cmd, env):
    print("+", " ".join(cmd), flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    sys.stdout.write(p.stdout[-4000:])
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        sys.exit(f"command failed (rc={p.returncode}): {' '.join(cmd)}")
    return p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--n_train", type=int, default=96)
    ap.add_argument("--n_test", type=int, default=16)
    ap.add_argument("--platform", default="cpu",
                    help="EET_PLATFORM for the subprocesses (cpu keeps "
                         "the rehearsal off the shared TPU)")
    ap.add_argument("--decode", default="lexicon_beam",
                    choices=["greedy", "prefix_beam", "lexicon_beam"])
    ap.add_argument("--fast", action="store_true",
                    help="CI-sized: tiny corpus, 2 epochs, greedy checks")
    args = ap.parse_args()
    if args.fast:
        args.epochs = min(args.epochs, 2)
        args.n_train, args.n_test = 24, 6

    work = args.workdir or tempfile.mkdtemp(prefix="dress_rehearsal_")
    corpus = os.path.join(work, "corpus")
    moddir = os.path.join(work, "model")
    os.makedirs(corpus, exist_ok=True)

    print(f"dress rehearsal in {work}")
    make_corpus(corpus, "train-clean-100", args.n_train, seed=1)
    make_corpus(corpus, "test-clean", args.n_test, seed=2)

    env = dict(os.environ, EET_PLATFORM=args.platform)
    tiny = ["--d_model", "64", "--n_enc_exits", "2",
            "--n_enc_layers_per_exit", "1", "--n_heads", "4",
            "--d_feed_forward", "128", "--depthwise_kernel_size", "7",
            "--compute_dtype", "float32"]
    train_out = run([sys.executable, os.path.join(REPO, "train.py"),
                     "--decoder_mode", "ctc", "--data_root", corpus,
                     "--n_epochs", str(args.epochs),
                     "--batch_size", "8", "--n_batch_split", "1",
                     "--save_model_dir", moddir, "--n_workers", "2",
                     "--log_dir", os.path.join(work, "runs"), *tiny], env)

    losses = [float(m) for m in re.findall(
        r"LOSS_TOTAL-\d+ := ([0-9.]+)", train_out)]
    if len(losses) >= 2 and not losses[-1] < losses[0]:
        sys.exit(f"training did not improve: {losses[0]} -> {losses[-1]}")

    ckpts = sorted(f for f in os.listdir(moddir) if f.endswith(
        "-transformer") and f.startswith("mod"))
    infer_out = run([sys.executable, os.path.join(REPO, "inference.py"),
                     "--decoder_mode", "ctc", "--data_root", corpus,
                     "--eval_splits", "test-clean",
                     "--load_model_path", os.path.join(moddir, ckpts[-1]),
                     "--decode", args.decode,
                     "--beam_size", "4", "--batch_size", "8",
                     "--n_batch_split", "1", "--n_workers", "2",
                     "--log_dir", os.path.join(work, "runs"), *tiny], env)

    wers = {f"exit{m[0]}": float(m[1]) for m in re.findall(
        r"test-clean WER exit (\d+): ([0-9.]+)%", infer_out)}
    n_utts = len(re.findall(r"test-clean EXPECTED:", infer_out))
    if not wers:
        sys.exit("no per-exit WER lines in inference output")
    if n_utts != args.n_test:
        sys.exit(f"decoded {n_utts}/{args.n_test} test utterances")

    print(json.dumps({
        "corpus": corpus, "epochs": args.epochs,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "decode": args.decode, "test_utts": n_utts, "wer_pct": wers,
    }))


if __name__ == "__main__":
    main()
