#!/usr/bin/env python
"""StreamPool load test: churn + latency distribution (VERDICT r2 item 8).

Drives a StreamPool at production geometry with ragged mixed-length
streams joining and leaving continuously, and reports the per-poll-round
latency distribution (p50/p90/p99), chunk throughput, and — for the
gated variant — the escalation rate under load.

    python tools/pool_load_test.py --streams 16 --rounds 60
    python tools/pool_load_test.py --streams 16 --gated --exit_threshold 0.85
    EET_PLATFORM=cpu python tools/pool_load_test.py --smoke   # CI-sized

One poll round = ONE batched device dispatch for every stream with a
ready chunk (two for the gated pool when any row escalates), so round
latency is the serving-side budget per chunk_s of audio per stream.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EET_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=60)
    ap.add_argument("--chunk_s", type=float, default=1.0)
    ap.add_argument("--left_s", type=float, default=3.0)
    ap.add_argument("--right_s", type=float, default=0.5)
    ap.add_argument("--gated", action="store_true")
    ap.add_argument("--exit_threshold", type=float, default=0.85)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--n_exits", type=int, default=6)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--load_model_path", default=None,
                    help="optional trained checkpoint (else random init)")
    ap.add_argument("--audio", default="noise",
                    choices=["noise", "synthetic"],
                    help="synthetic = tone-corpus utterances, so a "
                         "trained checkpoint's gate sees in-distribution "
                         "audio")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims / few rounds (CI)")
    args = ap.parse_args()
    if args.smoke:
        args.streams, args.rounds = 4, 6
        args.d_model, args.n_exits, args.n_layers = 32, 2, 1
        args.chunk_s, args.left_s, args.right_s = 0.3, 0.6, 0.2

    import jax

    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.serving import StreamPool
    from early_exit_tpu.training import checkpoint

    heads = max(4, args.d_model // 32)
    cfg = ModelConfig(d_model=args.d_model, n_heads=heads,
                      d_feed_forward=4 * args.d_model,
                      n_enc_exits=args.n_exits,
                      n_enc_layers_per_exit=args.n_layers,
                      depthwise_kernel_size=7 if args.smoke else 31)
    acfg = AudioConfig()
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    if args.load_model_path:
        params, state = checkpoint.load_model_file(args.load_model_path,
                                                   params, state)

    kw = dict(chunk_s=args.chunk_s, left_s=args.left_s,
              right_s=args.right_s)
    if args.gated:
        kw.update(exit_threshold=args.exit_threshold, fast_exit=1)
    pool = StreamPool(args.streams, params, state, cfg, acfg, **kw)

    rng = np.random.RandomState(0)
    sr = acfg.sample_rate
    chunk_n = int(args.chunk_s * sr)

    if args.audio == "synthetic":
        from early_exit_tpu.data.librispeech import SyntheticDataset
        ds = SyntheticDataset(n_items=256, seed=99, min_words=4,
                              max_words=20)
        bank = [ds[i].waveform for i in range(len(ds))]
        bank_i = [0]

        def draw(n):
            w = bank[bank_i[0] % len(bank)]
            bank_i[0] += 1
            if len(w) >= n:
                return w[:n]
            return np.pad(w, (0, n - len(w)))
    else:
        def draw(n):
            return 0.1 * rng.randn(n).astype(np.float32)

    def new_len():
        # ragged stream lengths: 2..14 s (0.5..1.5 s in smoke mode so
        # churn actually happens within the few smoke rounds)
        if args.smoke:
            return int((0.5 + 1.0 * rng.rand()) * sr)
        return int((2.0 + 12.0 * rng.rand()) * sr)

    remaining = [new_len() for _ in range(args.streams)]
    churned = 0

    # warmup: pre-trace every dispatchable program shape (batched round
    # AND the single-row finish flush), then one full fed round to warm
    # the host paths too
    pool.warmup()
    for i in range(args.streams):
        pool.feed(i, draw(chunk_n))
    pool.poll()

    lat, chunks = [], 0
    t_start = time.perf_counter()
    for r in range(args.rounds):
        for i in range(args.streams):
            n = min(chunk_n, remaining[i])
            pool.feed(i, draw(n))
            remaining[i] -= n
        t0 = time.perf_counter()
        out = pool.poll()
        lat.append(time.perf_counter() - t0)
        chunks += args.streams
        for i in range(args.streams):
            if remaining[i] <= 0:          # stream leaves, new one joins
                pool.finish(i)
                pool.reset(i)
                remaining[i] = new_len()
                churned += 1
    wall = time.perf_counter() - t_start

    lat_ms = np.asarray(sorted(lat)) * 1e3
    result = {
        "streams": args.streams, "rounds": args.rounds,
        "gated": bool(args.gated), "churned_streams": churned,
        "round_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
        "round_ms_p90": round(float(np.percentile(lat_ms, 90)), 2),
        "round_ms_p99": round(float(np.percentile(lat_ms, 99)), 2),
        "chunks_per_s": round(chunks / wall, 1),
        "audio_x_realtime": round(chunks * args.chunk_s / wall, 1),
    }
    if args.gated:
        exits = [e for rec in pool.recs for e in rec.exits_run]
        if exits:
            result["fast_exit_rate"] = round(
                float(np.mean(np.asarray(exits) == 1)), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
