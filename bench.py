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
        log_probs, sub_len, _ = early_conformer.apply(
            params, state, feats, lengths, cfg, train=False)
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
    print(json.dumps({
        "metric": "early_conformer_infer_rtf_x",
        "value": round(rtf_x, 2),
        "unit": ("audio_sec/wall_sec (b128, 10s utts, all 6 exits + greedy); "
                 "vs_baseline = x the A100-40%MFU estimate (75000x RT)"),
        "vs_baseline": round(rtf_x / A100_ANCHOR_RTF, 3),
    }))


if __name__ == "__main__":
    main()
