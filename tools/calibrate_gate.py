#!/usr/bin/env python
"""Calibrate the confidence gate on held-out data.

Fits, per exit: (1) a temperature (Guo et al. 2017, NLL grid fit) and
(2) an operating threshold — the loosest one whose ACCEPTED set stays
within --target_wer_delta percentage points of the final exit's corpus
WER — for each confidence score (maxprob / margin / negentropy), then
simulates the gate and recommends the score with the lowest mean exit.
Writes a JSON consumed by `inference.py --gate_calibration`:

    python tools/calibrate_gate.py --out gate_calib.json \
        --load_model_path CKPT --data_root DIR --eval_splits dev-clean \
        [--target_wer_delta 0.0] [usual inference.py flags]
    python inference.py --gate_calibration gate_calib.json ...

Calibrate on a DIFFERENT split than you evaluate (dev vs test) — the
thresholds are chosen to satisfy the constraint on the calibration set.

Rationale: raw mean-max-prob is systematically overconfident, shallow
exits more than deep ones (BENCH_NOTES.md, matching the early-exit
literature), so one shared raw threshold either over-escalates easy
audio or accepts garbage under shift. Per-exit calibrated thresholds
pin the quality constraint instead of guessing it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EET_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import jax
import numpy as np

from early_exit_tpu.runtime import enable_compilation_cache

enable_compilation_cache()


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out", default="gate_calibration.json")
    ap.add_argument("--target_wer_delta", type=float, default=0.0,
                    help="accepted-set corpus WER may exceed the final "
                         "exit's by this many percentage points")
    ap.add_argument("--scores", default="maxprob,margin,negentropy")
    tool_args, rest = ap.parse_known_args(argv)

    from early_exit_tpu.cli import get_args
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.models import early_exit_gate, gate_calibration
    from early_exit_tpu.ops import ctc as ctc_ops
    from early_exit_tpu.training import checkpoint, trainer
    from early_exit_tpu.utils.metrics import _edit_ops
    from early_exit_tpu.data.librispeech import (LibriSpeechDataset,
                                                 SyntheticDataset)
    from early_exit_tpu.data.pipeline import Pipeline

    args, model_cfg, train_cfg, audio_cfg, tokenizer = get_args(
        rest, mode="infer")
    if model_cfg.model_type not in early_exit_gate.GATED_MODEL_TYPES:
        sys.exit(f"gate calibration needs a multi-exit encoder "
                 f"({', '.join(early_exit_gate.GATED_MODEL_TYPES)})")
    scores = [s for s in tool_args.scores.split(",") if s]
    temps = list(gate_calibration.DEFAULT_TEMP_GRID)

    model = build_model(model_cfg)
    params, model_state = model.init(jax.random.PRNGKey(args.seed),
                                     model_cfg)
    if args.load_model_path is not None:
        params, model_state = checkpoint.load_model_file(
            args.load_model_path, params, model_state)
    elif None not in (args.load_model_dir, args.avg_model_start,
                      args.avg_model_end):
        params, model_state = checkpoint.avg_models(
            args.load_model_dir, args.avg_model_start, args.avg_model_end,
            params, model_state)
    else:
        sys.exit("need --load_model_path or --load_model_dir + "
                 "--avg_model_start/--avg_model_end")

    if args.synthetic_data:
        ds = SyntheticDataset(n_items=max(args.batch_size, 8),
                              seed=args.seed + 7)
        split = "synthetic"
    else:
        split = args.eval_splits.split(",")[0]
        ds = LibriSpeechDataset(args.data_root, split)
    pipe = Pipeline(ds, tokenizer, audio_cfg, train_cfg, bpe=args.bpe,
                    shuffle=False, infer_mode=True, workers=args.n_workers)

    fwd = jax.jit(trainer.make_eval_forward(model, model_cfg,
                                            log_probs=True))

    @jax.jit
    def confidences(lp, sub_len):
        """(E,B,T',V) log-probs -> conf (n_scores, K, E, B)."""
        mask = (np.arange(lp.shape[2])[None, :] < sub_len[:, None])
        rows = []
        for score in scores:
            per_temp = []
            for t in temps:
                per_temp.append(jax.vmap(
                    lambda l: gate_calibration.scaled_confidence(
                        l, mask, score, t))(lp))
            rows.append(jax.numpy.stack(per_temp))
        return jax.numpy.stack(rows)

    decode = jax.jit(lambda lp, l: ctc_ops.greedy_decode(
        lp.reshape((-1,) + lp.shape[2:]), jax.numpy.tile(l, lp.shape[0]),
        blank=model_cfg.blank_id))

    conf_chunks, err_chunks, word_chunks = [], [], []
    n_utts = 0
    for batch in pipe.epoch(0):
        lp, sub_len = fwd(params, model_state, batch["feats"],
                          batch["feat_lengths"])
        E, B = lp.shape[0], lp.shape[1]
        conf = np.asarray(confidences(lp, sub_len))     # (S,K,E,B)
        toks, n_toks = decode(lp, sub_len)
        toks = np.asarray(toks).reshape(E, B, -1)
        n_toks = np.asarray(n_toks).reshape(E, B)
        mask = np.asarray(batch["item_mask"]).astype(bool)
        labels = np.asarray(batch["labels"])
        lab_len = np.asarray(batch["label_lengths"])
        errs = np.zeros((E, B))
        words = np.zeros((B,))
        for b in range(B):
            if not mask[b]:
                continue
            ref = tokenizer.decode(
                [int(t) for t in labels[b][1:lab_len[b]]]).lower().split()
            words[b] = max(len(ref), 1)
            for e in range(E):
                hyp = tokenizer.decode(
                    [int(t) for t in toks[e, b][:n_toks[e, b]]]
                ).lower().split()
                errs[e, b] = _edit_ops(ref, hyp)
        conf_chunks.append(conf[:, :, :, mask])
        err_chunks.append(errs[:, mask])
        word_chunks.append(words[mask])
        n_utts += int(mask.sum())

    conf = np.concatenate(conf_chunks, axis=3)          # (S,K,E,N)
    errors = np.concatenate(err_chunks, axis=1)         # (E,N)
    words = np.concatenate(word_chunks)                 # (N,)
    E = errors.shape[0]
    final_wer = errors[-1].sum() / max(words.sum(), 1.0)
    target = final_wer + tool_args.target_wer_delta / 100.0
    print(f"{split}: {n_utts} utts, final-exit WER "
          f"{100 * final_wer:.2f}%, accepted-set target "
          f"{100 * target:.2f}%")

    report = {"split": split, "eval_utts": n_utts,
              "target_wer_delta_pp": tool_args.target_wer_delta,
              "final_exit_wer_pct": round(100 * final_wer, 2),
              "checkpoint": args.load_model_path or args.load_model_dir,
              "per_score": {}}
    best = None
    for si, score in enumerate(scores):
        temperatures, stats = [], []
        for e in range(E):
            correct = (errors[e] == 0).astype(np.float64)
            ki = gate_calibration.fit_temperature(conf[si, :, e], temps,
                                                  correct)
            temperatures.append(temps[ki])
            stats.append({
                "exit": e + 1, "temperature": round(temps[ki], 4),
                "exit_wer_pct": round(
                    100 * errors[e].sum() / max(words.sum(), 1.0), 2),
                "ece_raw": round(gate_calibration.ece(
                    conf[si, temps.index(1.0), e], correct), 4),
                "ece_cal": round(gate_calibration.ece(conf[si, ki, e],
                                                      correct), 4),
            })
        cal_conf = np.stack([conf[si, temps.index(t), e]
                             for e, t in enumerate(temperatures)])
        # thresholds are fitted SEQUENTIALLY so the simulated gated WER
        # is guaranteed <= target on this set (per-exit accepted-set
        # constraints do not compose; gate_calibration docstring)
        thresholds = gate_calibration.fit_sequential_thresholds(
            cal_conf, errors, words, target)
        mean_exit, gated_wer, chosen = gate_calibration.simulate_gate(
            cal_conf, thresholds, errors, words)
        for e in range(E):
            stats[e]["threshold"] = round(thresholds[e], 6)
            stats[e]["accept_share"] = round(
                float(np.mean(chosen == e + 1)), 4)
        entry = {"temperatures": temperatures, "thresholds": thresholds,
                 "mean_exit": round(mean_exit, 3),
                 "gated_wer_pct": round(100 * gated_wer, 2),
                 "per_exit": stats}
        report["per_score"][score] = entry
        print(f"  {score:10s}: mean exit {mean_exit:.2f}/{E}, "
              f"gated WER {100 * gated_wer:.2f}%")
        if best is None or mean_exit < best[1]:
            best = (score, mean_exit)
    report["score"] = best[0]
    report["thresholds"] = report["per_score"][best[0]]["thresholds"]
    report["temperatures"] = report["per_score"][best[0]]["temperatures"]
    with open(tool_args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"recommended score: {best[0]} -> {tool_args.out}")
    return report


if __name__ == "__main__":
    main()
