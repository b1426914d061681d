"""early_exit_tpu — a TPU-native early-exit Conformer ASR framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``augustgw/early-exit-transformer`` (PyTorch/CUDA reference): early-exit
Conformer encoders trained with per-exit CTC (and optional per-exit
attention decoders), a log-mel frontend, SentencePiece-compatible BPE
tokenization, CTC/AED beam-search decoding, Noam-AdamW optimization and
checkpoint averaging — all built for TPU hardware: static shapes,
functional parameter pytrees, `jax.sharding` data/tensor parallelism and
Pallas kernels on the hot paths.

The package is organised as:

- ``early_exit_tpu.nn``        functional layer library (pure JAX)
- ``early_exit_tpu.models``    model zoo (early_conformer, splitformer,
                               early_zipformer, full_conformer, legacy
                               transformer models)
- ``early_exit_tpu.ops``       numerical ops: CTC loss, log-mel frontend,
                               masking; Pallas kernels under ``ops.pallas``
- ``early_exit_tpu.parallel``  device mesh + sharding rules
- ``early_exit_tpu.data``      host data pipeline: LibriSpeech reader,
                               length bucketing, label cleaning
- ``early_exit_tpu.tokenizer`` SentencePiece-model-compatible BPE
- ``early_exit_tpu.decoding``  greedy/prefix-beam CTC, AED beam search,
                               lexicon correction
- ``early_exit_tpu.optim``     Noam schedule + AdamW (optax)
- ``early_exit_tpu.training``  train state, train/eval steps, checkpoints
"""

__version__ = "0.1.0"
