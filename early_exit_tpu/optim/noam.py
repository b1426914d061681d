"""Noam LR schedule + AdamW, via optax.

Parity with the reference optimizer stack:
- NoamOpt rate = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
  (util/noam_opt.py:35-40), applied per step starting at step 1.
- AdamW(lr from schedule, betas=(0.9, 0.98), eps=adam_eps,
  weight_decay) over ALL parameters — the reference does not mask
  biases/norms from weight decay (train.py:261-262).
- Gradient clipping by global norm BEFORE the optimizer step
  (train.py:69, torch clip_grad_norm_).
"""

from __future__ import annotations

import optax


def noam_schedule(d_model: int, warmup: int):
    scale = d_model ** -0.5
    w = float(max(warmup, 1))

    def schedule(count):
        import jax.numpy as jnp
        step = count + 1.0   # optax counts from 0; NoamOpt from 1
        return scale * jnp.minimum(step ** -0.5, step * (w ** -1.5))
    return schedule


def make_optimizer(d_model: int, warmup: int, *, clip: float = 1.0,
                   adam_eps: float = 1e-9, weight_decay: float = 5e-4,
                   b1: float = 0.9, b2: float = 0.98):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(learning_rate=noam_schedule(d_model, warmup),
                    b1=b1, b2=b2, eps=adam_eps,
                    weight_decay=weight_decay),
    )
