"""AED beam search — static shapes, KV cache, jittable.

Behavior parity with `BeamInference.beam_search` (util/beam_infer.py:198-307):

- start from [SOS]; per step the decoder's last-position log-probs are
  divided by the length penalty ((5 + len)/6)^alpha (beam_infer.py:194-195,
  242) and added to the running scores; top-k over (beams × vocab)
- a beam selecting EOS after `min_length` steps is retired ("final") and
  stops competing (beam_infer.py:252-284); EOS before min_length is kept
  as an ordinary token (parity with the reference's `and i > min_length`)
- when max_length is reached, still-active beams are dumped into the
  final set (beam_infer.py:287-296); the best beam is the final with the
  highest raw score (no extra normalisation, beam_infer.py:303-307)

TPU-native redesign: fixed `beam_size` lanes with done-masks instead of a
shrinking Python list; one `lax.scan` over max_length steps; the decoder
runs incrementally with per-layer KV caches reordered by beam parent
(the reference re-runs the full decoder per step, beam_infer.py:236-240 —
O(L²·layers) vs our O(L·layers)).

Note: `beam_size == self.args.beam_size` at beam_infer.py:212 is a
comparison, not an assignment (reference bug) — callers there always pass
beam_size explicitly; here it is simply a required argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import transformer_decoder
from early_exit_tpu.nn import core as nn

NEG = -1e30


def length_penalty(length, alpha):
    """((5 + len)/6)^alpha — beam_infer.py:194-195."""
    return ((5.0 + length) / 6.0) ** alpha


def beam_search_exit(params, memory, cfg: ModelConfig, *, n_exit: int,
                     beam_size: int, max_length: int, min_length: int,
                     pen_alpha: float = 1.0):
    """Beam-decode ONE utterance from exit `n_exit` (1-based).

    memory: (1, T', D) encoder hidden state of that exit.
    Returns (tokens (beam, max_length+1) incl. leading SOS,
             lengths (beam,), scores (beam,), best_idx ()).
    """
    e = n_exit - 1
    dec_params = jax.tree_util.tree_map(lambda a: a[e], params["decoders"])
    out_lin = jax.tree_util.tree_map(lambda a: a[e], params["out_linear"])
    return beam_search(dec_params, out_lin, params["emb"],
                       params["final_ln"], memory, cfg,
                       beam_size=beam_size, max_length=max_length,
                       min_length=min_length, pen_alpha=pen_alpha)


def beam_search(dec_params, out_lin, emb, final_ln, memory,
                cfg: ModelConfig, *, beam_size: int, max_length: int,
                min_length: int, pen_alpha: float = 1.0):
    K = beam_size
    D = cfg.d_model
    V = cfg.vocab_size
    mem = jnp.broadcast_to(memory, (K,) + memory.shape[1:])   # (K, T', D)
    pe = nn.sinusoidal_pe(max_length + 1, D)

    tokens0 = jnp.full((K, max_length + 1), cfg.pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cfg.bos_id)
    lengths0 = jnp.ones((K,), jnp.int32)
    # only lane 0 is live initially (all lanes hold [SOS]; duplicates would
    # multiply-count the same prefix)
    scores0 = jnp.full((K,), NEG, jnp.float32).at[0].set(0.0)
    done0 = jnp.zeros((K,), bool)
    cache0 = transformer_decoder.init_cache(dec_params, K, max_length + 1, D)

    def embed_step(tok, pos):
        x = nn.embedding_lookup(emb, tok[:, None])            # (K, 1, D)
        return x + pe[pos][None, None, :]

    def step(carry, i):
        tokens, lengths, scores, done, cache = carry
        # decode the token at position lengths-1 == i (all lanes in sync)
        x_t = embed_step(tokens[:, i], i)
        h, new_cache = transformer_decoder.step_apply(
            dec_params, x_t, mem, cfg.n_heads, final_ln, cache,
            compute_dtype=cfg.dtype)
        logits = nn.linear(out_lin, h, compute_dtype=cfg.dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                  axis=-1)[:, 0, :]           # (K, V)
        logp = logp / length_penalty(i + 1.0, pen_alpha)

        # candidate matrix: active lanes expand over V; done lanes keep
        # exactly one candidate (their current score) at the PAD column
        cand = scores[:, None] + logp                         # (K, V)
        done_row = jnp.where(jnp.arange(V) == cfg.pad_id, 0.0, NEG)
        cand = jnp.where(done[:, None], scores[:, None] + done_row, cand)

        flat_scores, flat_idx = lax.top_k(cand.reshape(-1), K)
        parent = flat_idx // V
        tok = flat_idx % V

        new_tokens = tokens[parent]
        new_lengths = lengths[parent]
        was_done = done[parent]
        at_next = jnp.arange(max_length + 1)[None, :] == i + 1   # (1, L+1)
        new_tokens = jnp.where(at_next & ~was_done[:, None],
                               tok[:, None].astype(jnp.int32), new_tokens)
        new_lengths = jnp.where(was_done, new_lengths, new_lengths + 1)
        newly_done = (~was_done) & (tok == cfg.eos_id) & (i > min_length)
        new_done = was_done | newly_done

        # reorder caches by parent
        new_cache = {
            "k": new_cache["k"][:, parent],
            "v": new_cache["v"][:, parent],
            "pos": new_cache["pos"],
        }
        return (new_tokens, new_lengths, flat_scores, new_done,
                new_cache), None

    carry = (tokens0, lengths0, scores0, done0, cache0)
    (tokens, lengths, scores, done, _), _ = lax.scan(
        step, carry, jnp.arange(max_length))

    best_idx = jnp.argmax(scores)
    return tokens, lengths, scores, best_idx


def beam_search_exit_batch(params, memories, min_lengths, cfg: ModelConfig,
                           *, n_exit: int, beam_size: int, max_length: int,
                           pen_alpha: float = 1.0):
    """Batched beam decode: all utterances of a bucket at once (the
    reference — and `beam_search_exit` — decode one utterance at a time,
    inference.py:27-51; vmapping the whole search across utterances keeps
    the MXU fed).

    memories: (B, T', D) encoder states of exit `n_exit`;
    min_lengths: (B,) per-utterance minimum lengths (the max_length is
    shared — bucket it at the caller).
    Returns (tokens (B, beam, max_length+1), lengths (B, beam),
             scores (B, beam), best_idx (B,))."""
    e = n_exit - 1
    dec_params = jax.tree_util.tree_map(lambda a: a[e], params["decoders"])
    out_lin = jax.tree_util.tree_map(lambda a: a[e], params["out_linear"])

    def one(memory, min_len):
        return beam_search(dec_params, out_lin, params["emb"],
                           params["final_ln"], memory[None], cfg,
                           beam_size=beam_size, max_length=max_length,
                           min_length=min_len, pen_alpha=pen_alpha)

    return jax.vmap(one)(memories, min_lengths)


def trim_hypothesis(tokens, length, *, eos_id: int, bos_id: int):
    """Host-side helper: (max_len+1,) padded lane -> python id list without
    SOS; keeps EOS if present (the reference's best_combined includes the
    EOS it appended, beam_infer.py:258-260)."""
    toks = [int(t) for t in tokens[1:int(length)]]
    return toks
