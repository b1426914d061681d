"""Model/runtime configuration dataclasses.

Field names mirror the reference CLI flags (util/conf.py:5-453) so configs
round-trip through the same `train.py` / `inference.py` surface, with types
fixed (the reference declares several float flags as `type=int`,
util/conf.py:283-291, 385-430 — we parse them as floats).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # Architecture (flag parity: util/conf.py:171-300)
    model_type: str = "early_conformer"   # early_conformer|splitformer|early_zipformer|full_conformer
    d_model: int = 256
    n_heads: int = 8
    d_feed_forward: int = 2048
    n_enc_exits: int = 6
    n_enc_layers_per_exit: int = 2
    n_dec_layers: int = 6
    depthwise_kernel_size: int = 31
    drop_prob: float = 0.1
    max_len: int = 2000
    n_mels: int = 80

    # Vocabulary / special ids (util/conf.py:465-482; BPE-256 defaults)
    vocab_size: int = 256
    blank_id: int = 0        # src_pad_idx / CTC blank ('@', id 0)
    pad_id: int = 126        # trg_pad_idx
    bos_id: int = 1          # trg_sos_idx
    eos_id: int = 2          # trg_eos_idx

    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"       # matmul dtype; fp32 softmax/LN always
    conv_norm: str = "batch"              # conformer conv-module norm
    length_mode: str = "reference"        # "reference": clamp(len/4); "true": exact conv arithmetic
    remat: bool = False                   # jax.checkpoint each block
    attention_impl: str = "xla"           # "xla" | "pallas" (fused VMEM attention)
    # dtype of the residual stream between sublayers; None = compute_dtype.
    # bfloat16 halves activation HBM traffic (~1.65x faster forward on
    # v5e); norms/log-probs still compute in float32.
    residual_dtype: str | None = None
    # dtype of the materialised attention score/prob tensors; bfloat16
    # saves another ~20% forward time (inference); float32 for training.
    attn_softmax_dtype: str = "float32"
    # route inference through the fused whole-block Pallas kernel
    # (ops/pallas/conformer_block.py); training always uses the XLA path
    fused_block: bool = False
    # "int8": W8A8 dynamic quantization of the encoder-block linears at
    # inference — int8 MXU runs at 2× the bf16 rate on v5e; per-token
    # activation scales + per-channel weight scales keep decode parity
    # (tests/test_quantize.py). Training always runs unquantized.
    quantize: str = "none"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def rdtype(self):
        rd = self.residual_dtype or self.compute_dtype
        return jnp.bfloat16 if rd == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    n_batch_split: int = 4
    n_epochs: int = 10000
    warmup: int = -1
    adam_eps: float = 1e-9
    weight_decay: float = 5e-4
    clip: float = 1.0
    max_utterance_length: int = 360
    decoder_mode: str = "ctc"            # ctc | aed
    aed_ce_weight: float = 0.7
    aed_ctc_weight: float = 0.3
    # reference quirk train.py:57-58 (padded CTC input lengths) —
    # default OFF: it destabilises deep exits on padded batches
    # (BENCH_NOTES.md); enable for reference-parity debugging only
    ctc_compat_padded_lengths: bool = False
    fast_rng: bool = True     # rbg PRNG for dropout masks (much faster on TPU)
    # self-distillation: KL(stop_grad(softmax(deepest exit)) || exit e)
    # added per earlier exit — implements the reference's reserved
    # --distill flag (util/conf.py:48-57: "not implemented" there)
    distill: bool = False
    distill_weight: float = 1.0
    distill_temperature: float = 2.0
    # dynamic-chunk streaming training (WeNet U2-style): each step
    # samples a chunked self-attention mask (or full attention, 50%),
    # so one model serves both whole-utterance and streaming inference
    # (serving/streaming.py). early_conformer CTC mode only.
    dynamic_chunk: bool = False
    chunk_left: int = 1000    # chunks of left context kept (1000 ≈ all)
    # SpecAugment masking (beyond-reference; ops/specaugment.py) —
    # frequency masks of width U[0, w], adaptive time masks of width
    # U[0, frac·valid_len] per item
    specaugment: bool = False
    sa_freq_masks: int = 2
    sa_freq_width: int = 27
    sa_time_masks: int = 2
    sa_time_frac: float = 0.05
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    sample_rate: int = 16000
    n_fft: int = 512          # NOTE: actual FFT size is n_fft*2 (data_loader.py:8)
    win_length: int = 320
    hop_length: int = 160
    n_mels: int = 80
    # "fft": jnp.fft.rfft lowering; "dft": real-DFT as two matmuls —
    # ~25% faster on TPU v5e MXU but embeds the DFT basis as an HLO
    # constant (slow first remote compile; amortised by the cache)
    mel_method: str = "fft"
