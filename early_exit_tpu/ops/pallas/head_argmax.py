"""Fused per-exit CTC head + frame argmax (greedy-decode epilogue).

The greedy inference path (reference inference.py:66-72 decodes every
exit greedily) needs only the per-frame ARGMAX of each exit's head
logits. Materializing the (E, B, T', V) logits tensor in HBM —
~100 MB bf16 at the bench geometry — just to argmax it back is pure
bandwidth waste: this kernel reads each exit's hidden states once,
computes the (ROWS, V) logits tile-by-tile in VMEM on the MXU, reduces
to the argmax id on the VPU, and writes only the (E, B, T') int32 ids —
128x less output traffic (VERDICT r3 item 4's "fuse the heads' matmul +
argmax, skip materializing (E,B,T,V)").

Grid: (ceil(B*T/ROWS),); each step computes ALL E exits for its row
tile (TPU block rules want the out block's second-to-last dim to be the
full E axis). VMEM per step at the flagship shapes (E=6, D=V=256):
1.5 MB hidden + 0.75 MB weights + 0.5 MB f32 logits scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512                 # rows (B*T frames) per grid step


def _kernel(E, h_ref, w_ref, b_ref, out_ref):
    rows, V = h_ref.shape[1], w_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, V), 1)
    for e in range(E):     # static unroll: E independent head matmuls
        h = h_ref[e]                                # (ROWS, D) bf16
        logits = jax.lax.dot_general(
            h, w_ref[e], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # f32 MXU accumulation
        # round to bf16 and add the bias in bf16 — the exact numerics of
        # nn.linear(compute_dtype=bf16), so the argmax (and hence the
        # greedy decode) matches the XLA head path bit-for-bit
        logits = (logits.astype(jnp.bfloat16)
                  + b_ref[e][None, :]).astype(jnp.float32)
        # explicit lowest-index tie-break (jnp.argmax semantics): bf16's
        # coarse grid produces genuine logit ties, and the backend
        # argmax reduction's tie winner is unspecified
        m = jnp.max(logits, axis=-1, keepdims=True)
        out_ref[e] = jnp.min(jnp.where(logits == m, iota, V),
                             axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_argmax(hidden: jax.Array, w: jax.Array, b: jax.Array,
                *, interpret: bool = False) -> jax.Array:
    """hidden: (E, B, T, D); w: (E, D, V); b: (E, V) ->
    per-frame argmax token ids (E, B, T) int32.

    Exact: the logits are formed in VMEM with the same numerics as the
    XLA head path (bf16 MXU dot -> bf16 round -> bf16 bias add), so the
    argmax matches `apply_heads(..., log_probs=False)` decode
    bit-for-bit (argmax is softmax-invariant)."""
    E, B, T, D = hidden.shape
    V = w.shape[-1]
    h2 = hidden.reshape(E, B * T, D).astype(jnp.bfloat16)
    n_rows = B * T
    grid = (pl.cdiv(n_rows, ROWS),)
    out = pl.pallas_call(
        functools.partial(_kernel, E),
        grid=grid,
        in_specs=[
            pl.BlockSpec((E, ROWS, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # constant index maps: Pallas skips the re-copy of blocks
            # whose index doesn't change between steps
            pl.BlockSpec((E, D, V), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, V), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, ROWS), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, n_rows), jnp.int32),
        interpret=interpret,
    )(h2, w.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    return out.reshape(E, B, T)
