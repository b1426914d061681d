"""Batched CTC prefix beam search with blank-skip pruning (TPU-native).

Replaces torchaudio's `cuda_ctc_decoder` (util/beam_infer.py:79-80,
102-112: nbest=1, beam_size, blank_skip_threshold=0.95) with a pure-JAX,
jittable, batch-vectorised implementation:

- fixed `beam` lanes; prefixes live in a static (beam, max_out) buffer
- per frame, each lane yields 1 "stay" candidate (blank + repeat-last
  transitions, prefix unchanged) and `topn` "extend" candidates (the
  frame's top-N non-blank tokens), giving beam×(topn+1) candidates
- equal prefixes are merged in the log-semiring via an equality matrix
  (no host hash maps — an O(C²) mask + logsumexp); the merge key is TWO
  independent 32-bit rolling hashes plus (length, last token), so a
  false merge needs a simultaneous collision in both hash streams
  (~2⁻⁶⁴ per candidate pair — vanishing at beam×topn scale)
- frames whose blank log-prob exceeds log(blank_skip_threshold) are
  treated as pure blank and skipped (the cuda_ctc_decoder fast path)
- `lax.scan` over time; per-item input lengths freeze the carry

Supports nbest>1 (the reference's cuda_ctc_decoder exposes nbest,
util/beam_infer.py:79); nbest=1 keeps the legacy return shapes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30
# two independent rolling-hash streams (multiplier, token offset):
# h <- h*M + (tok + A), in uint32 wraparound arithmetic
_HASH_MULT = jnp.uint32(1000003)
_HASH_ADD = jnp.uint32(1)
_HASH_MULT2 = jnp.uint32(2654435761)   # Knuth's 2^32/phi
_HASH_ADD2 = jnp.uint32(0x9E3779B9)


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def prefix_beam_search(log_probs: jax.Array, lengths: jax.Array, *,
                       beam_size: int = 10, blank: int = 0,
                       blank_skip_threshold: float = 0.95,
                       topn: int = 16, max_out: int | None = None,
                       nbest: int = 1):
    """log_probs: (B, T, V) log-softmax emissions; lengths: (B,).

    nbest=1 (default): returns (tokens (B, max_out) blank-padded,
    n_tokens (B,), scores (B,) total log-prob of the best prefix).
    nbest>1: returns (tokens (B, nbest, max_out), n_tokens (B, nbest),
    scores (B, nbest)), best first."""
    B, T, V = log_probs.shape
    if max_out is None:
        max_out = T
    topn = min(topn, V - 1)
    nbest = min(nbest, beam_size)
    fn = partial(_prefix_beam_single, beam_size=beam_size, blank=blank,
                 log_skip=math.log(blank_skip_threshold), topn=topn,
                 max_out=max_out, nbest=nbest)
    toks, n, scores = jax.vmap(fn)(log_probs, lengths)
    if nbest == 1:
        return toks[:, 0], n[:, 0], scores[:, 0]
    return toks, n, scores


def _prefix_beam_single(lp: jax.Array, length: jax.Array, *, beam_size: int,
                        blank: int, log_skip: float, topn: int,
                        max_out: int, nbest: int = 1):
    T, V = lp.shape
    K = beam_size
    C = K * (topn + 1)

    prefix0 = jnp.full((K, max_out), blank, jnp.int32)
    plen0 = jnp.zeros((K,), jnp.int32)
    hash0 = jnp.zeros((K, 2), jnp.uint32)
    last0 = jnp.full((K,), -1, jnp.int32)
    p_b0 = jnp.full((K,), NEG, jnp.float32).at[0].set(0.0)
    p_nb0 = jnp.full((K,), NEG, jnp.float32)

    def step(carry, xs):
        prefix, plen, phash, last, p_b, p_nb = carry
        lp_t, t = xs
        lp_blank = lp_t[blank]

        def skip_frame(_):
            nb = _logaddexp(p_b, p_nb) + lp_blank
            return prefix, plen, phash, last, nb, jnp.full((K,), NEG,
                                                           jnp.float32)

        def full_frame(_):
            # frame's top-N non-blank tokens
            lp_nb = lp_t.at[blank].set(NEG)
            tok_lp, tok_id = lax.top_k(lp_nb, topn)        # (topn,)

            # --- stay candidates (one per lane): blank + repeat-last
            lp_last = jnp.where(last >= 0,
                                lp_t[jnp.clip(last, 0, V - 1)], NEG)
            stay_pb = _logaddexp(p_b, p_nb) + lp_blank
            stay_pnb = p_nb + lp_last

            # --- extend candidates (K, topn)
            is_repeat = tok_id[None, :] == last[:, None]
            base = jnp.where(is_repeat, p_b[:, None],
                             _logaddexp(p_b, p_nb)[:, None])
            ext_pnb = base + tok_lp[None, :]
            ext_pb = jnp.full((K, topn), NEG, jnp.float32)

            # --- assemble C candidates
            cand_pb = jnp.concatenate([stay_pb[:, None], ext_pb],
                                      axis=1).reshape(C)
            cand_pnb = jnp.concatenate([stay_pnb[:, None], ext_pnb],
                                       axis=1).reshape(C)
            parent = jnp.repeat(jnp.arange(K), topn + 1)
            is_ext = jnp.tile(
                jnp.concatenate([jnp.zeros((1,), bool),
                                 jnp.ones((topn,), bool)]), K)
            ext_tok = jnp.concatenate(
                [jnp.full((K, 1), -1, jnp.int32),
                 jnp.broadcast_to(tok_id[None, :], (K, topn))],
                axis=1).reshape(C)

            c_plen = plen[parent] + is_ext.astype(jnp.int32)
            c_plen = jnp.minimum(c_plen, max_out)
            tok_u32 = ext_tok.astype(jnp.uint32)
            c_hash = jnp.stack([
                jnp.where(is_ext,
                          phash[parent, 0] * _HASH_MULT
                          + (tok_u32 + _HASH_ADD),
                          phash[parent, 0]),
                jnp.where(is_ext,
                          phash[parent, 1] * _HASH_MULT2
                          + (tok_u32 + _HASH_ADD2),
                          phash[parent, 1]),
            ], axis=1)                                      # (C, 2)
            c_last = jnp.where(is_ext, ext_tok, last[parent])

            # suppress extensions that would overflow the buffer
            overflow = is_ext & (plen[parent] >= max_out)
            cand_pnb = jnp.where(overflow, NEG, cand_pnb)

            # materialise candidate prefixes
            c_prefix = prefix[parent]                       # (C, max_out)
            at_pos = (jnp.arange(max_out)[None, :]
                      == jnp.clip(plen[parent], 0, max_out - 1)[:, None])
            c_prefix = jnp.where(at_pos & is_ext[:, None]
                                 & ~overflow[:, None],
                                 ext_tok[:, None], c_prefix)

            # --- merge identical prefixes (2×hash, len, last) in log space
            key_eq = ((c_hash[:, None, 0] == c_hash[None, :, 0])
                      & (c_hash[:, None, 1] == c_hash[None, :, 1])
                      & (c_plen[:, None] == c_plen[None, :])
                      & (c_last[:, None] == c_last[None, :]))
            # combined scores summed over the equivalence class
            mpb = jnp.where(key_eq, cand_pb[None, :], NEG)
            mpnb = jnp.where(key_eq, cand_pnb[None, :], NEG)
            comb_pb = jax.nn.logsumexp(mpb, axis=1)
            comb_pnb = jax.nn.logsumexp(mpnb, axis=1)
            owner = jnp.argmax(key_eq, axis=1)              # first equal idx
            is_owner = owner == jnp.arange(C)
            comb_pb = jnp.where(is_owner, comb_pb, NEG)
            comb_pnb = jnp.where(is_owner, comb_pnb, NEG)

            # --- prune to K
            total = _logaddexp(comb_pb, comb_pnb)
            _, top_idx = lax.top_k(total, K)
            return (c_prefix[top_idx], c_plen[top_idx], c_hash[top_idx],
                    c_last[top_idx], comb_pb[top_idx], comb_pnb[top_idx])

        new = lax.cond(lp_blank > log_skip, skip_frame, full_frame,
                       operand=None)
        # freeze when past this item's length
        active = t < length
        out = tuple(jnp.where(active, n, o) for n, o in zip(new, carry))
        return out, None

    carry = (prefix0, plen0, hash0, last0, p_b0, p_nb0)
    (prefix, plen, phash, last, p_b, p_nb), _ = lax.scan(
        step, carry, (lp, jnp.arange(T)))
    total = _logaddexp(p_b, p_nb)
    scores, order = lax.top_k(total, nbest)     # lanes hold distinct prefixes
    return prefix[order], plen[order], scores
