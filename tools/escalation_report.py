#!/usr/bin/env python
"""Per-utterance confidence-driven escalation evidence (VERDICT r4 item 4).

Demonstrates the calibrated gate doing what it claims: easy utterances
exit shallow, hard ones escalate deep and recover quality — the per-
utterance depth choice the reference's always-all-exits inference
(/root/reference/inference.py:66-72) cannot make. On a fresh-seed
SyntheticDataset split drawn from the flagship's training distribution
(the calib asset's `bench_eval` knobs) it reports:

- the per-exit ACCEPT HISTOGRAM (share of utterances accepted at each
  exit) — escalation is real only if this is spread, not a point mass;
- an SNR-BUCKET table (ground-truth per-utterance noise sigma
  quartiles): mean chosen exit, gated WER, exit-1 and exit-E WER per
  bucket — hard buckets must choose deeper exits;
- sigma<->chosen-exit Pearson + Spearman correlation;
- the full per-exit WER ladder vs the gated WER, and the mean exits run
  vs E (the compute saving).

    python tools/escalation_report.py \
        --ckpt assets/flagship_ckpt --calib assets/flagship_calib.json \
        --out reports/escalation_v3_seed1.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("EET_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.runtime import enable_compilation_cache

enable_compilation_cache()


def wer_counts(ref_words, hyp_words):
    """(edit_distance, n_ref_words) via banded-free DP (small strings)."""
    R, H = len(ref_words), len(hyp_words)
    D = np.zeros((R + 1, H + 1), np.int32)
    D[:, 0] = np.arange(R + 1)
    D[0, :] = np.arange(H + 1)
    for a in range(1, R + 1):
        for b in range(1, H + 1):
            D[a, b] = min(D[a - 1, b] + 1, D[a, b - 1] + 1,
                          D[a - 1, b - 1] + (ref_words[a - 1]
                                             != hyp_words[b - 1]))
    return int(D[R, H]), max(R, 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(REPO, "assets",
                                                   "flagship_ckpt"))
    ap.add_argument("--calib", default=os.path.join(REPO, "assets",
                                                    "flagship_calib.json"))
    ap.add_argument("--out", default=None, help="output JSON path")
    ap.add_argument("--n_utts", type=int, default=256)
    ap.add_argument("--seed", type=int, default=9999,
                    help="eval corpus seed — fresh vs train(1001)/"
                         "test(2002)/dev(4004)/bench(7777) draws")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_buckets", type=int, default=4)
    ap.add_argument("--fused_block", action="store_true",
                    help="run the fused whole-block kernel (TPU only)")
    ap.add_argument("--model_json", default=None,
                    help="ModelConfig field overrides as JSON (tests / "
                         "non-flagship dims); default = reference dims")
    args = ap.parse_args(argv)

    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.data.librispeech import SyntheticDataset
    from early_exit_tpu.models import early_conformer, early_exit_gate
    from early_exit_tpu.ops import ctc, frontend
    from early_exit_tpu.tokenizer.bpe import load_tokenizer
    from early_exit_tpu.training import checkpoint

    with open(args.calib) as f:
        calib = json.load(f)
    knobs = calib.get("bench_eval", {})
    tok_path = calib.get("tokenizer")
    if tok_path and not os.path.isabs(tok_path):
        tok_path = os.path.join(REPO, tok_path)
    if not tok_path:
        from early_exit_tpu.cli import resolve_bpe_model
        tok_path = resolve_bpe_model("")
    tok = load_tokenizer(tok_path, prefer_native=False)

    acfg = AudioConfig()
    overrides = json.loads(args.model_json) if args.model_json else {}
    cfg = ModelConfig(attn_softmax_dtype="bfloat16",
                      fused_block=args.fused_block, **overrides)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    params, state = checkpoint.load_model_file(args.ckpt, params, state)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params)

    ds = SyntheticDataset(n_items=args.n_utts, seed=args.seed,
                          min_words=knobs.get("min_words", 18),
                          max_words=knobs.get("max_words", 22),
                          noise=knobs.get("noise", 0.02),
                          noise_hi=knobs.get("noise_hi"),
                          speaker_warp=knobs.get("speaker_warp", 0.0),
                          dur_jitter=knobs.get("dur_jitter", 0.0),
                          amp_jitter=knobs.get("amp_jitter", 0.0))
    utts = [ds[i] for i in range(args.n_utts)]
    max_n = max(len(u.waveform) for u in utts)

    THRESHOLD = calib["thresholds"]
    TEMPS = calib["temperatures"]
    SCORE = calib["score"]
    E = cfg.n_enc_exits

    @jax.jit
    def run_gated(params, state, wav, n, item_mask):
        feats = frontend.mel_spectrogram(wav, acfg, method="dft")
        lengths = frontend.mel_lengths(n, acfg.hop_length)
        logp, chosen, sub_len, _ = early_exit_gate.gated_apply(
            params, state, feats, lengths, cfg, threshold=THRESHOLD,
            score=SCORE, temperatures=TEMPS, item_mask=item_mask)
        toks, ntoks = ctc.greedy_decode(logp, sub_len)
        return toks, ntoks, chosen

    @jax.jit
    def run_dense(params, state, wav, n):
        feats = frontend.mel_spectrogram(wav, acfg, method="dft")
        lengths = frontend.mel_lengths(n, acfg.hop_length)
        logits, sub_len, _ = early_conformer.apply(
            params, state, feats, lengths, cfg, train=False,
            log_probs=False)
        toks, ntoks = jax.vmap(
            lambda lp: ctc.greedy_decode(lp, sub_len))(logits)
        return toks, ntoks

    B = args.batch_size
    per_utt = []            # dicts: sigma, chosen, gated (err,n), per-exit
    for k0 in range(0, args.n_utts, B):
        chunk = utts[k0:k0 + B]
        wav = np.zeros((B, max_n), np.float32)
        n = np.zeros((B,), np.int32)
        mask = np.zeros((B,), np.int32)
        for j, u in enumerate(chunk):
            wav[j, :len(u.waveform)] = u.waveform
            n[j] = len(u.waveform)
            mask[j] = 1
        gt, gn, chosen = run_gated(params, state, jnp.asarray(wav),
                                   jnp.asarray(n), jnp.asarray(mask))
        dt, dn = run_dense(params, state, jnp.asarray(wav),
                           jnp.asarray(n))
        gt, gn = np.asarray(gt), np.asarray(gn)
        dt, dn = np.asarray(dt), np.asarray(dn)
        chosen = np.asarray(chosen)
        for j, u in enumerate(chunk):
            ref = u.transcript.lower().split()
            hyp = tok.decode([int(t) for t in gt[j][:gn[j]]]).lower()
            gerr, gwords = wer_counts(ref, hyp.split())
            exits_err = []
            for e in range(E):
                h = tok.decode([int(t) for t in
                                dt[e, j][:dn[e, j]]]).lower()
                exits_err.append(wer_counts(ref, h.split())[0])
            per_utt.append({"sigma": u.noise_sigma,
                            "chosen": int(chosen[j]),
                            "gated_err": gerr, "words": gwords,
                            "exit_err": exits_err})

    sig = np.array([u["sigma"] for u in per_utt])
    cho = np.array([u["chosen"] for u in per_utt], np.float64)
    words = np.array([u["words"] for u in per_utt], np.float64)
    gerr = np.array([u["gated_err"] for u in per_utt], np.float64)
    eerr = np.array([u["exit_err"] for u in per_utt], np.float64)  # (N,E)

    def pearson(a, b):
        a = a - a.mean(); b = b - b.mean()
        den = float(np.sqrt((a * a).sum() * (b * b).sum()))
        return float((a * b).sum() / den) if den else 0.0

    def spearman(a, b):
        return pearson(np.argsort(np.argsort(a)).astype(np.float64),
                       np.argsort(np.argsort(b)).astype(np.float64))

    hist = {f"exit{e + 1}": round(float(np.mean(cho == e + 1)), 4)
            for e in range(E)}
    qs = np.quantile(sig, np.linspace(0, 1, args.n_buckets + 1))
    qs[-1] += 1e-9
    buckets = []
    for b in range(args.n_buckets):
        m = (sig >= qs[b]) & (sig < qs[b + 1])
        if not m.any():
            continue
        buckets.append({
            "sigma_range": [round(float(qs[b]), 3),
                            round(float(qs[b + 1]), 3)],
            "n_utts": int(m.sum()),
            "mean_chosen_exit": round(float(cho[m].mean()), 3),
            "gated_wer_pct": round(100 * gerr[m].sum()
                                   / words[m].sum(), 2),
            "exit1_wer_pct": round(100 * eerr[m, 0].sum()
                                   / words[m].sum(), 2),
            f"exit{E}_wer_pct": round(100 * eerr[m, -1].sum()
                                      / words[m].sum(), 2),
        })
    report = {
        "ckpt": args.ckpt, "calib": args.calib,
        "n_utts": args.n_utts, "seed": args.seed,
        "eval_knobs": knobs,
        "score": SCORE, "thresholds": THRESHOLD,
        "temperatures": TEMPS,
        "accept_histogram": hist,
        "mean_exits": round(float(cho.mean()), 3),
        "gated_wer_pct": round(100 * gerr.sum() / words.sum(), 2),
        "exit_wer_ladder": {
            f"exit{e + 1}": round(100 * eerr[:, e].sum()
                                  / words.sum(), 2) for e in range(E)},
        "sigma_exit_pearson": round(pearson(sig, cho), 3),
        "sigma_exit_spearman": round(spearman(sig, cho), 3),
        "snr_buckets": buckets,
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return report


if __name__ == "__main__":
    main()
