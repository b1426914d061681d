#!/usr/bin/env python
"""Pre-compile the jitted executables for the standard bucket shapes.

Remote TPU compiles in this environment take minutes per new graph shape;
the persistent compilation cache (early_exit_tpu.runtime) makes them
one-time. Run this once before long training/inference sessions so the
steady-state loop never stalls on a compile:

    python tools/warm_cache.py --decoder_mode ctc [--max_seconds 18] ...

Compiles the train step and eval forward for every (batch-bucket,
frame-bucket) combination the pipeline can produce up to --max_seconds.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from early_exit_tpu.cli import get_args
from early_exit_tpu.data import bucketing
from early_exit_tpu.models.registry import build_model
from early_exit_tpu.optim import make_optimizer
from early_exit_tpu.training import trainer


def main():
    argv = sys.argv[1:]
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--max_seconds", type=float, default=18.0)
    extra.add_argument("--batches", type=str, default="",
                       help="comma-separated batch buckets (default: "
                            "those reachable from --batch_size)")
    ex, rest = extra.parse_known_args(argv)
    args, model_cfg, train_cfg, audio_cfg, tokenizer = get_args(rest)
    model = build_model(model_cfg)

    max_frames = int(ex.max_seconds * audio_cfg.sample_rate
                     / audio_cfg.hop_length) + 1
    frame_buckets = sorted({bucketing.bucket_frames(t)
                            for t in range(100, max_frames + 100, 100)})
    if ex.batches:
        batch_buckets = [int(b) for b in ex.batches.split(",")]
    else:
        per_split = max(args.batch_size // args.n_batch_split, 1)
        batch_buckets = sorted({bucketing.bucket_batch_size(n)
                                for n in (per_split // 2, per_split,
                                          per_split * 2, args.batch_size)})
    label_buckets = [bucketing.bucket_labels(l) for l in (16, 64, 128)]

    opt = make_optimizer(model_cfg.d_model, warmup=1000)
    state = trainer.create_train_state(jax.random.PRNGKey(0), model,
                                       model_cfg, opt)
    step = jax.jit(trainer.make_train_step(model, model_cfg, train_cfg,
                                           opt))
    fwd = jax.jit(trainer.make_eval_forward(model, model_cfg))
    # inference.py defaults to the bf16-softmax profile (cli mode="infer");
    # warm that variant of the forward too, plus the DFT-matmul mel whose
    # remote compile is the pathological one
    import dataclasses

    from early_exit_tpu.ops import frontend
    infer_cfg = dataclasses.replace(model_cfg,
                                    attn_softmax_dtype="bfloat16")
    fwd_infer = jax.jit(trainer.make_eval_forward(model, infer_cfg))
    mel_dft = jax.jit(lambda wav: frontend.mel_spectrogram(
        wav, audio_cfg, method="dft"))
    rng = jax.random.PRNGKey(1)

    n_done = 0
    for nb in batch_buckets:
        for tf in frame_buckets:
            lb = label_buckets[min(tf // 700, len(label_buckets) - 1)]
            batch = {
                "feats": jnp.zeros((nb, tf, model_cfg.n_mels),
                                   jnp.float32),
                "feat_lengths": jnp.full((nb,), tf, jnp.int32),
                "labels": jnp.full((nb, lb), model_cfg.bos_id, jnp.int32),
                "label_lengths": jnp.full((nb,), min(4, lb), jnp.int32),
                "item_mask": jnp.ones((nb,), jnp.float32),
            }
            t0 = time.time()
            s2, m = step(state, batch, rng)
            float(m["loss"])
            fwd(state["params"], state["model_state"], batch["feats"],
                batch["feat_lengths"])
            fwd_infer(state["params"], state["model_state"],
                      batch["feats"], batch["feat_lengths"])
            mel_dft(jnp.zeros((nb, (tf - 1) * audio_cfg.hop_length),
                              jnp.float32))
            n_done += 1
            print(f"warmed B={nb} T={tf} L={lb} "
                  f"({time.time() - t0:.1f}s)")
    print(f"done: {n_done} shape combinations cached")


if __name__ == "__main__":
    main()
