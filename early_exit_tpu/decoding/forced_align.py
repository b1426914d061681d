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


def forced_align(emission: jax.Array, tokens: jax.Array,
                 blank: int = 0):
    """Convenience: per-token start frames. Returns (starts (L,) int array,
    total best-path score)."""
    import numpy as np
    tr = get_trellis(emission, tokens, blank)
    pts = backtrack(tr, emission, tokens, blank)
    L = int(tokens.shape[0])
    starts = np.full((L,), -1, np.int64)
    for p in pts:
        if starts[p.token_index] < 0:
            starts[p.token_index] = p.time_index
    score = float(tr[-1, -1])
    return starts, score
