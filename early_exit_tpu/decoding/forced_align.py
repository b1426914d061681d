"""CTC forced alignment: trellis DP + backtrack.

Capability parity with `BeamInference.get_trellis` / `backtrack`
(util/beam_infer.py:129-191), used there by the (commented-out) joint
CTC/attention rescoring path. TPU-native: the trellis is a `lax.scan`
max-product DP; backtracking is a reverse scan with static shapes.

Semantics (beam_infer.py:143-149): trellis[t+1, j] =
max(trellis[t, j] + em[t, blank],  trellis[t, j-1] + em[t, tok[j-1]]) —
i.e. stay (emit blank) vs advance (emit the next token).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30


@dataclasses.dataclass
class Point:
    token_index: int
    time_index: int
    score: float


def get_trellis(emission: jax.Array, tokens: jax.Array,
                blank: int = 0) -> jax.Array:
    """emission: (T, V) log-probs; tokens: (L,) -> trellis (T+1, L+1)."""
    T, V = emission.shape
    L = tokens.shape[0]
    row0 = jnp.full((L + 1,), NEG, jnp.float32).at[0].set(0.0)
    tok_em = jnp.take(emission, tokens, axis=1)       # (T, L)
    blank_em = emission[:, blank]                     # (T,)

    def body(prev, xs):
        b_t, e_t = xs
        stay = prev + b_t
        change = jnp.concatenate([jnp.full((1,), NEG),
                                  prev[:-1] + e_t])
        new = jnp.maximum(stay, change)
        return new, new

    _, rows = lax.scan(body, row0, (blank_em, tok_em))
    return jnp.concatenate([row0[None], rows], axis=0)


def backtrack(trellis: jax.Array, emission: jax.Array, tokens: jax.Array,
              blank: int = 0) -> List[Point]:
    """Host-side backtrack from (T, L) (beam_infer.py:153-191 semantics:
    cumulative score per step, `changed > stayed` decides advancement).
    Returns the path in forward time order."""
    import numpy as np
    tr = np.asarray(trellis)
    em = np.asarray(emission)
    tk = np.asarray(tokens)
    Tn = tr.shape[0] - 1
    j = tr.shape[1] - 1
    path = []
    prob = 0.0
    for t in range(Tn, 0, -1):
        stayed = tr[t - 1, j] + em[t - 1, blank]
        changed = tr[t - 1, j - 1] + em[t - 1, tk[j - 1]]
        prob = prob + float(em[t - 1, tk[j - 1] if changed > stayed
                               else blank])
        path.append(Point(j - 1, t - 1, prob))
        if changed > stayed:
            j -= 1
            if j == 0:
                break
    return path[::-1]


_trellis_jit = jax.jit(get_trellis, static_argnums=(2,))


def _bucket(n: int, g: int) -> int:
    return max(((n + g - 1) // g) * g, g)


def forced_align(emission: jax.Array, tokens: jax.Array,
                 blank: int = 0, bucket: bool = True):
    """Convenience: per-token start/end frames. Returns (starts (L,),
    ends (L,), total best-path score). starts[j] is the frame where token
    j is emitted; ends[j] is the LAST frame attributed to token j — the
    frame before the path advances to token j+1 (blank "stay" frames
    belong to the most recently emitted token, the torchaudio
    merge_repeats convention), so a token held over several frames gets
    its full span, not a 1-frame stub.

    bucket=True pads (T, L) to quantized shapes so the lax.scan trellis
    compiles once per bucket instead of once per utterance (per-utterance
    shapes made `--timestamps` evals compile-dominated on TPU). Padding
    is exact, not approximate: pad frames score 0 for blank and NEG for
    every token (the DP just carries row T forward), and pad token
    COLUMNS cannot influence the real ones — trellis column j depends
    only on columns <= j — so slicing the padded trellis back to
    (T+1, L+1) reproduces the unpadded DP bit-for-bit."""
    import numpy as np
    em = np.asarray(emission, np.float32)
    tk = np.asarray(tokens)
    T, V = em.shape
    L = int(tk.shape[0])
    if bucket:
        Tp, Lp = _bucket(T, 64), _bucket(L, 16)
        em_p = np.full((Tp, V), NEG, np.float32)
        em_p[:T] = em
        em_p[T:, blank] = 0.0
        tk_p = np.full((Lp,), blank, tk.dtype if tk.size else np.int32)
        tk_p[:L] = tk
        tr = np.asarray(_trellis_jit(jnp.asarray(em_p),
                                     jnp.asarray(tk_p), blank))
        tr = tr[:T + 1, :L + 1]
    else:
        tr = get_trellis(jnp.asarray(em), jnp.asarray(tk), blank)
    pts = backtrack(tr, em, tk, blank)
    starts = np.full((L,), -1, np.int64)
    ends = np.full((L,), -1, np.int64)
    for p in pts:                      # forward time order
        if starts[p.token_index] < 0:
            starts[p.token_index] = p.time_index
        ends[p.token_index] = p.time_index
    score = float(tr[-1, -1])
    return starts, ends, score
