#!/usr/bin/env python
"""Promote a trained reference-scale checkpoint to the committed
flagship assets that power bench.py's gated north-star leg.

Writes:
  assets/flagship_ckpt       — the checkpoint with float params cast to
                               bfloat16 (batch-norm statistics stay
                               fp32), ~63 MB at reference dims
  assets/flagship_calib.json — the calibrated per-exit gate operating
                               point (from tools/calibrate_gate.py
                               output) plus the `bench_eval` corpus
                               knobs bench.py must evaluate the gated
                               leg on (the checkpoint's training
                               distribution — so the per-exit WER
                               ladder is non-degenerate and escalation
                               is genuinely exercised; VERDICT r3
                               item 1).

    python tools/promote_flagship.py \
        --ckpt /tmp/refscale_v2/model_seed1/mod095-transformer \
        --calib /tmp/refscale_v2/gate_calib_seed1.json \
        --knobs '{"min_words": 18, "max_words": 22, "noise": 0.05,
                  "noise_hi": 0.4, "speaker_warp": 0.15,
                  "dur_jitter": 0.3, "amp_jitter": 0.4}'
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("EET_PLATFORM", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def _sha256(path: str) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="trained mod{NNN}-transformer checkpoint")
    ap.add_argument("--calib", required=True,
                    help="tools/calibrate_gate.py output JSON")
    ap.add_argument("--knobs", required=True,
                    help="JSON dict of SyntheticDataset knobs for the "
                         "bench gated eval (the checkpoint's training "
                         "distribution)")
    ap.add_argument("--tokenizer", default=None,
                    help="the BPE model the checkpoint was TRAINED with "
                         "(default: the CLIs' resolution — the committed "
                         "assets/spm model). Recorded path + sha256 in "
                         "flagship_calib.json; bench.py decodes the "
                         "flagship with exactly this file and aborts on "
                         "a hash mismatch (VERDICT r4: the round-4 "
                         "102%-WER regression came from an implicit "
                         "checkpoint<->tokenizer binding)")
    ap.add_argument("--out_dir", default=os.path.join(REPO, "assets"))
    args = ap.parse_args(argv)

    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.training import checkpoint

    cfg = ModelConfig()          # reference dims — what bench.py builds
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    params, state = checkpoint.load_model_file(args.ckpt, params, state)

    def cast(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    # params to bf16 (inference runs in bf16 anyway); keep model_state
    # (batch-norm statistics) fp32 — they normalize in fp32
    params = jax.tree_util.tree_map(cast, params)

    out_ckpt = os.path.join(args.out_dir, "flagship_ckpt")
    checkpoint.save_pytree({"params": params, "model_state": state},
                           out_ckpt)
    print(f"wrote {out_ckpt} "
          f"({os.path.getsize(out_ckpt) / 1e6:.1f} MB)")

    with open(args.calib) as f:
        calib = json.load(f)
    knobs = json.loads(args.knobs)

    # the explicit checkpoint<->tokenizer binding: record WHICH BPE
    # model the checkpoint decodes with, by path and content hash. The
    # reference never needs this because its artifact is fixed
    # (util/conf.py:473-474 loads one hardcoded model); our resolution
    # order is a moving target, which round 4 proved by decoding the
    # r3 checkpoint with a tokenizer it was never trained with.
    from early_exit_tpu.cli import resolve_bpe_model
    tok_path = os.path.abspath(args.tokenizer or resolve_bpe_model(""))
    tok_rel = os.path.relpath(tok_path, REPO)
    if tok_rel.startswith(".."):
        tok_rel = tok_path          # outside the repo: keep absolute
    # phase-A depth for the serving cascade (bench.py's primary gated
    # strategy): minimize expected exits/utterance from the dev accept
    # shares (serving/cascade.choose_k)
    from early_exit_tpu.serving.cascade import choose_k
    per_exit = calib.get("per_score", {}).get(
        calib["score"], {}).get("per_exit", [])
    shares = [st.get("accept_share", 0.0) for st in per_exit]
    out = {
        "score": calib["score"],
        "thresholds": calib["thresholds"],
        "temperatures": calib["temperatures"],
        "tokenizer": tok_rel,
        "tokenizer_sha256": _sha256(tok_path),
        "cascade_k": (choose_k(shares, len(calib["thresholds"]))
                      if shares else 2),
        "provenance": {
            "ckpt": args.ckpt,
            "calib": args.calib,
            "calib_split": calib.get("split"),
            "dev_final_exit_wer_pct": calib.get("final_exit_wer_pct"),
            "dev_gated_wer_pct": calib.get("per_score", {}).get(
                calib["score"], {}).get("gated_wer_pct"),
            "dev_mean_exit": calib.get("per_score", {}).get(
                calib["score"], {}).get("mean_exit"),
            "target_wer_delta_pp": calib.get("target_wer_delta_pp"),
        },
        "bench_eval": knobs,
    }
    out_calib = os.path.join(args.out_dir, "flagship_calib.json")
    with open(out_calib, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_calib}")


if __name__ == "__main__":
    main()
