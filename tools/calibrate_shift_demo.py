#!/usr/bin/env python
"""Gate calibration under domain shift — end-to-end evidence run.

Setting: a hard-mode reference-scale checkpoint
(tools/reference_scale_run.py --workdir /tmp/refscale_hard ...) whose
per-exit WER ladder on the shifted test-other split has real structure
(e.g. 19.8% at exit 1 -> 6.0% at exit 6) while test-clean is ~0%
everywhere. The raw maxprob gate at threshold 0.85 stays at mean exit
1.00 even on test-other (overconfidence under shift, BENCH_NOTES.md).

This driver:
  1. generates dev-clean / dev-other / dev-mixed calibration splits in
     the workdir corpus (same generator knobs as the eval splits,
     DIFFERENT seeds — calibration never sees the eval utterances);
  2. fits gate calibrations on dev-other and on dev-mixed
     (tools/calibrate_gate.py);
  3. evaluates test-clean and test-other through inference.py with
     (a) the raw scalar gate, (b) each calibration JSON;
  4. prints one JSON summary (gated WER + mean exits per setting).

    python tools/calibrate_shift_demo.py --workdir /tmp/refscale_hard \
        --ckpt /tmp/refscale_hard/model_seed1/mod017-transformer
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, env, log_path=None):
    print("+", " ".join(cmd), flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if log_path:
        with open(log_path, "a", encoding="utf-8") as f:
            f.write("+ " + " ".join(cmd) + "\n" + p.stdout + p.stderr)
    if p.returncode != 0:
        sys.stdout.write(p.stdout[-3000:])
        sys.stderr.write(p.stderr[-3000:])
        sys.exit(f"command failed (rc={p.returncode}): {' '.join(cmd)}")
    return p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/refscale_hard")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n_dev", type=int, default=240)
    ap.add_argument("--noise", type=float, default=0.06,
                    help="the workdir corpus's train-split noise knob")
    ap.add_argument("--target_wer_delta", type=float, default=0.5)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.reference_scale_run import make_corpus, parse_wers

    corpus = os.path.join(args.workdir, "corpus")
    log = os.path.join(args.workdir, "log_shift_demo.txt")
    # hard-split knobs mirror reference_scale_run's test-other mapping
    hard = dict(noise=3 * args.noise, speaker_warp=0.1, dur_jitter=0.2,
                amp_jitter=0.3)
    clean = dict(noise=args.noise, speaker_warp=0.1, dur_jitter=0.2,
                 amp_jitter=0.3)   # the TRAIN distribution of hard mode
    marker = os.path.join(corpus, ".done_dev")
    if not os.path.exists(marker):
        print("generating dev splits ...", flush=True)
        make_corpus(corpus, "dev-clean", args.n_dev, seed=5005,
                    min_words=2, max_words=28, **clean)
        make_corpus(corpus, "dev-other", args.n_dev, seed=4004,
                    min_words=2, max_words=28, **hard)
        # mixed: half in-domain, half shifted (fresh seeds again;
        # distinct speaker ids so the two halves' file stems differ)
        make_corpus(corpus, "dev-mixed", args.n_dev // 2, seed=6006,
                    min_words=2, max_words=28, speaker="1001", **clean)
        make_corpus(corpus, "dev-mixed", args.n_dev // 2, seed=7007,
                    min_words=2, max_words=28, speaker="2002", **hard)
        open(marker, "w").write("ok")

    env = dict(os.environ)
    common = ["--decoder_mode", "ctc", "--load_model_path", args.ckpt,
              "--data_root", corpus, "--batch_size", "64",
              "--n_batch_split", "4", "--n_workers", "4",
              "--compute_dtype", "bfloat16"]

    calibs = {}
    for dev in ("dev-other", "dev-mixed"):
        cj = os.path.join(args.workdir, f"calib_{dev}.json")
        run([sys.executable, os.path.join(REPO, "tools/calibrate_gate.py"),
             "--out", cj, "--target_wer_delta", str(args.target_wer_delta),
             "--eval_splits", dev, *common], env, log)
        with open(cj) as f:
            calibs[dev] = {"path": cj, "report": json.load(f)}

    def gated_eval(extra, tag):
        out = run([sys.executable, os.path.join(REPO, "inference.py"),
                   "--eval_splits", "test-clean,test-other",
                   *common, *extra], env, log)
        res = {}
        for split in ("test-clean", "test-other"):
            m = re.search(rf"{split} gated WER: ([0-9.]+)% "
                          rf"\(mean exits run ([0-9.]+)", out)
            res[split] = {"gated_wer_pct": float(m.group(1)),
                          "mean_exits": float(m.group(2))}
        print(tag, res, flush=True)
        return res

    summary = {"checkpoint": args.ckpt,
               "raw_scalar": gated_eval(
                   ["--exit_threshold", str(args.threshold)],
                   f"raw maxprob {args.threshold}")}
    for dev, c in calibs.items():
        summary[f"calibrated_{dev}"] = gated_eval(
            ["--gate_calibration", c["path"]], f"calibrated on {dev}")
        summary[f"calibration_{dev}"] = {
            "score": c["report"]["score"],
            "thresholds": c["report"]["thresholds"],
            "temperatures": c["report"]["temperatures"],
            "dev_gated_wer_pct":
                c["report"]["per_score"][c["report"]["score"]]
                ["gated_wer_pct"],
            "dev_mean_exit":
                c["report"]["per_score"][c["report"]["score"]]
                ["mean_exit"],
        }
    out_path = args.out or os.path.join(args.workdir, "shift_demo.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
