"""Benchmark: early_conformer inference throughput on the local accelerator.

Measures end-to-end jitted inference — raw waveform → on-device log-mel
frontend → all 6 exits of the default early_conformer (d=256, 6×2 layers,
ffn 2048, k=31, BPE-256 vocab) → greedy CTC decode — and reports the
real-time factor (audio seconds processed per wall-clock second; higher is
better; 1.0 = real time).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference repo publishes no performance numbers, so the
baseline is the FLOPs-derived A100 estimate for this exact workload
(BASELINE.md "A100 anchor": 16.64 GFLOPs / 10 s utterance at 40% MFU of
312 bf16 TFLOPS = 75,000× real time); vs_baseline = RTF / 75,000, and
the north star "≥2× A100" is vs_baseline ≥ 2.0.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


from early_exit_tpu.runtime import enable_compilation_cache
enable_compilation_cache()


def main():
    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.ops import ctc, frontend

    acfg = AudioConfig()
    # reference dims, full bf16 inference, fused whole-block Pallas kernel
    cfg = ModelConfig(attn_softmax_dtype="bfloat16", fused_block=True)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)

    B, SECONDS = 128, 10.0
    N = int(SECONDS * acfg.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((0.1 * rng.randn(B, N)).astype(np.float32))
    sample_counts = jnp.asarray([N] * B)

    @jax.jit
    def infer(params, state, wav, sample_counts):
        # DFT-matmul mel: ~25% faster than the XLA FFT lowering on v5e;
        # its slow remote compile is amortised by the persistent cache
        feats = frontend.mel_spectrogram(wav, acfg, method="dft")
        lengths = frontend.mel_lengths(sample_counts, acfg.hop_length)
        # raw logits: greedy argmax is softmax-invariant, and skipping
        # the fp32 (E,B,T',V) log_softmax materialization saves ~1.6 ms
        # at B=128 (same tokens out — see apply_heads)
        log_probs, sub_len, _ = early_conformer.apply(
            params, state, feats, lengths, cfg, train=False,
            log_probs=False)
        # greedy decode the last exit (deepest head)
        tokens, n_tokens = ctc.greedy_decode(log_probs[-1], sub_len)
        # scalar fingerprint depending on every output: forces execution
        # even on backends where block_until_ready doesn't block (axon
        # relay), without timing a bulk host transfer.
        return (jnp.sum(n_tokens) + jnp.sum(tokens)
                + jnp.sum(log_probs[:, :, 0, 0]))

    # warmup / compile
    float(infer(params, state, wav, sample_counts))

    # measure the host<->device round-trip so it can be amortised out
    # (under the axon relay a single scalar fetch costs ~25 ms)
    tiny = jax.jit(lambda x: jnp.sum(x))
    float(tiny(sample_counts))
    rt = min(_timed(lambda: float(tiny(sample_counts)))
             for _ in range(5))

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, state, wav, sample_counts)
    float(out)   # one sync: the device stream ran all queued programs
    dt = max(time.perf_counter() - t0 - rt, 1e-6)

    audio_seconds = iters * B * SECONDS
    rtf_x = audio_seconds / dt
    A100_ANCHOR_RTF = 75000.0   # BASELINE.md: 1.664 GFLOPs/audio-sec @ 40% MFU
    result = {
        "metric": "early_conformer_infer_rtf_x",
        "value": round(rtf_x, 2),
        "unit": ("audio_sec/wall_sec (b128, 10s utts, all 6 exits + greedy); "
                 "vs_baseline = x the A100-40%MFU estimate (75000x RT); "
                 "gated_* = confidence-gated dynamic exit on the committed "
                 "trained checkpoint at WER parity (see gated_wer fields)"),
        "vs_baseline": round(rtf_x / A100_ANCHOR_RTF, 3),
    }
    try:
        result.update(gated_bench(rt))
    except Exception as e:          # the dense headline must still print
        result["gated_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


CKPT = "assets/flagship_ckpt"


def gated_bench(rt, fused=False):
    """North-star leg (BASELINE.json): confidence-gated dynamic early
    exit on a TRAINED reference-dims checkpoint, with measured WER
    equality vs the all-exits path on the same held-out audio.

    fused: run both legs through the fused whole-block kernel (the
    gate's while_loop body dispatches per-exit stacks through it).
    Returns extra keys for the bench JSON line; raises (caught by the
    caller) when the committed checkpoint is absent."""
    import os

    import numpy as np

    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.models import early_conformer, early_exit_gate
    from early_exit_tpu.ops import ctc, frontend
    from early_exit_tpu.training import checkpoint
    from early_exit_tpu.data.librispeech import SyntheticDataset
    from early_exit_tpu.tokenizer.bpe import load_tokenizer

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.path.join(here, CKPT)
    if not os.path.exists(ckpt):
        raise FileNotFoundError(CKPT)
    acfg = AudioConfig()
    cfg = ModelConfig(attn_softmax_dtype="bfloat16",   # reference dims
                      fused_block=fused)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    params, state = checkpoint.load_model_file(ckpt, params, state)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params)
    tok = None                        # same artifact fallback as cli.py
    for cand in (os.path.join(here, "sentencepiece/build/"
                              "libri.bpe-256.model"),
                 "/root/reference/sentencepiece/build/"
                 "libri.bpe-256.model"):
        if os.path.exists(cand):
            tok = load_tokenizer(cand, prefer_native=False)
            break
    if tok is None:
        raise FileNotFoundError("libri.bpe-256.model")

    # held-out audio from the trained distribution, ~10 s utterances.
    # The gate is batch-conservative (a batch runs until ALL its rows
    # are confident), so smaller batches are exacter per utterance but
    # starve the MXU; B=8/32/64/128 measured 69.6k/143.8k/152.4k/183.4k
    # RT on v5e with identical 0.00% WER and mean exit 1.00 — the
    # throughput-optimal 128 is the bench geometry
    B, NB = 128, 1                    # 1 micro-batch of 128
    ds = SyntheticDataset(n_items=B * NB, seed=7777, min_words=18,
                          max_words=22)
    utts = [ds[i] for i in range(B * NB)]
    max_n = max(len(u.waveform) for u in utts)
    wav = np.zeros((B * NB, max_n), np.float32)
    counts = np.zeros((B * NB,), np.int32)
    for i, u in enumerate(utts):
        wav[i, :len(u.waveform)] = u.waveform
        counts[i] = len(u.waveform)
    audio_s = float(counts.sum()) / acfg.sample_rate
    THRESHOLD = 0.85

    @jax.jit
    def dense(params, state, wav, n):
        feats = frontend.mel_spectrogram(wav, acfg, method="dft")
        lengths = frontend.mel_lengths(n, acfg.hop_length)
        logp, sub_len, _ = early_conformer.apply(
            params, state, feats, lengths, cfg, train=False)
        toks, ntoks = ctc.greedy_decode(logp[-1], sub_len)
        return toks, ntoks, jnp.sum(logp[:, :, 0, 0])

    @jax.jit
    def gated(params, state, wav, n):
        feats = frontend.mel_spectrogram(wav, acfg, method="dft")
        lengths = frontend.mel_lengths(n, acfg.hop_length)
        logp, chosen, sub_len, _ = early_exit_gate.gated_apply(
            params, state, feats, lengths, cfg, threshold=THRESHOLD)
        toks, ntoks = ctc.greedy_decode(logp, sub_len)
        return toks, ntoks, chosen, jnp.sum(logp[:, 0, 0])

    jw = [jnp.asarray(wav[k * B:(k + 1) * B]) for k in range(NB)]
    jn = [jnp.asarray(counts[k * B:(k + 1) * B]) for k in range(NB)]

    # WER both ways + mean exits (off the clock)
    def wer_of(decoded):
        err = tot = 0
        for i, (toks, ntoks) in enumerate(decoded):
            hyp = tok.decode([int(t) for t in toks[:ntoks]]).lower()
            ref = utts[i].transcript.lower().split()
            h = hyp.split()
            D = np.zeros((len(ref) + 1, len(h) + 1), np.int32)
            D[:, 0] = np.arange(len(ref) + 1)
            D[0, :] = np.arange(len(h) + 1)
            for a in range(1, len(ref) + 1):
                for b in range(1, len(h) + 1):
                    D[a, b] = min(D[a - 1, b] + 1, D[a, b - 1] + 1,
                                  D[a - 1, b - 1] + (ref[a - 1] != h[b - 1]))
            err += D[len(ref), len(h)]
            tot += len(ref)
        return 100.0 * err / max(tot, 1)

    dense_out, gated_out, exits = [], [], []
    for k in range(NB):
        t, n, _ = dense(params, state, jw[k], jn[k])
        dense_out += list(zip(np.asarray(t), np.asarray(n)))
        t, n, chosen, _ = gated(params, state, jw[k], jn[k])
        gated_out += list(zip(np.asarray(t), np.asarray(n)))
        exits += list(np.asarray(chosen))
    wer_dense = wer_of(dense_out)
    wer_gated = wer_of(gated_out)

    # timed: amortised dispatch, one sync per mode
    import os as _os
    bench_iters = int(_os.environ.get("EET_BENCH_ITERS", "20"))

    def timed(fn, sum_idx):
        float(fn(params, state, jw[0], jn[0])[sum_idx])   # warm
        iters = bench_iters
        t0 = time.perf_counter()
        for _ in range(iters):
            for k in range(NB):
                out = fn(params, state, jw[k], jn[k])
        float(out[sum_idx])
        return max(time.perf_counter() - t0 - rt, 1e-6) / iters

    dt_dense = timed(dense, 2)
    dt_gated = timed(gated, 3)
    return {
        "gated_rtf_x": round(audio_s / dt_gated, 2),
        "gated_vs_baseline": round(audio_s / dt_gated / 75000.0, 3),
        "gated_dense_rtf_x": round(audio_s / dt_dense, 2),
        "gated_speedup_vs_dense": round(dt_dense / dt_gated, 2),
        "gated_wer_pct": round(wer_gated, 2),
        "gated_wer_dense_pct": round(wer_dense, 2),
        "gated_mean_exits": round(float(np.mean(exits)), 2),
        "gated_threshold": THRESHOLD,
        "gated_eval_utts": B * NB,
    }


if __name__ == "__main__":
    main()
