"""Fused head+argmax Pallas kernel vs the XLA head path (interpret mode).

The greedy path (reference inference.py:66-72 decodes every exit) needs
only each exit's per-frame argmax; the kernel must reproduce the XLA
`apply_heads(..., log_probs=False)` -> argmax ids bit-for-bit, since the
bench's fused-parity assert (bench.py) compares decoded tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import early_conformer
from early_exit_tpu.ops import ctc
from early_exit_tpu.ops.pallas import head_argmax as ha


def _heads(E=2, D=64, V=96, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(E, D, V).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(E, V).astype(np.float32) * 0.1)
    return {"w": w, "b": b}


def _assert_ids_match_mod_ties(got, heads, hidden, cfg):
    """Kernel ids must equal the XLA head-path argmax everywhere EXCEPT
    positions where the XLA bf16 logits are exactly TIED at both ids:
    random weights on bf16's coarse grid produce genuine top-1 ties, and
    a ±1-ulp accumulation-order difference between the two dot
    implementations (XLA CPU gemm vs interpret-mode dot_general) then
    legitimately flips which of the tied ids wins. On trained (peaked)
    checkpoints ties at the top are absent and the ids are identical —
    which bench.py asserts on-device before timing."""
    logits = early_conformer.apply_heads(heads, hidden, cfg,
                                         log_probs=False)
    ref = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    got = np.asarray(got)
    ref_np = np.asarray(ref)
    bad = np.argwhere(got != ref_np)
    lg = np.asarray(logits.astype(jnp.float32))
    for e, b, t in bad:
        lr = lg[e, b, t, ref_np[e, b, t]]
        lk = lg[e, b, t, got[e, b, t]]
        assert lr == lk, (
            f"non-tie argmax mismatch at e={e} b={b} t={t}: "
            f"ref id {ref_np[e,b,t]} ({lr}) vs kernel id "
            f"{got[e,b,t]} ({lk})")


def test_kernel_matches_xla_bf16_head():
    """bf16 head numerics (the benched inference profile): same ids
    modulo exact bf16 ties."""
    cfg = ModelConfig(compute_dtype="bfloat16")
    heads = _heads()
    rng = np.random.RandomState(1)
    hidden = jnp.asarray(rng.randn(2, 3, 40, 64).astype(np.float32))
    got = ha.head_argmax(hidden, heads["w"], heads["b"], interpret=True)
    _assert_ids_match_mod_ties(got, heads, hidden, cfg)


def test_kernel_partial_last_block():
    """B*T not a multiple of ROWS: valid rows are still exact."""
    cfg = ModelConfig(compute_dtype="bfloat16")
    heads = _heads(seed=2)
    rng = np.random.RandomState(3)
    # 2*1*37 = 74 rows << ROWS=512 -> one padded grid step
    hidden = jnp.asarray(rng.randn(2, 1, 37, 64).astype(np.float32))
    got = ha.head_argmax(hidden, heads["w"], heads["b"], interpret=True)
    _assert_ids_match_mod_ties(got, heads, hidden, cfg)


def test_greedy_decode_ids_equals_greedy_decode():
    """ctc.greedy_decode == greedy_decode_ids(argmax(logp)) — the fused
    path swaps the logits argmax for kernel-produced ids."""
    rng = np.random.RandomState(4)
    logp = jnp.asarray(rng.randn(3, 20, 8).astype(np.float32))
    lengths = jnp.asarray([20, 11, 5])
    t0, n0 = ctc.greedy_decode(logp, lengths)
    t1, n1 = ctc.greedy_decode_ids(jnp.argmax(logp, axis=-1), lengths)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))


def test_apply_hidden_composes_with_kernel():
    """End-to-end fused greedy path: apply_hidden + kernel ids decode to
    the same tokens as the dense apply(log_probs=False) path."""
    cfg = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                      n_enc_exits=2, n_enc_layers_per_exit=1,
                      depthwise_kernel_size=7, vocab_size=16, n_mels=8,
                      compute_dtype="bfloat16", drop_prob=0.0)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(2, 57, cfg.n_mels).astype(np.float32))
    lengths = jnp.asarray([57, 33])

    logits, sub_len, _ = early_conformer.apply(
        params, state, feats, lengths, cfg, train=False, log_probs=False)
    ref_ids = jnp.argmax(logits, axis=-1)

    hidden, sub_len2 = early_conformer.apply_hidden(params, state, feats,
                                                    lengths, cfg)
    got_ids = ha.head_argmax(hidden, params["heads"]["w"],
                             params["heads"]["b"], interpret=True)
    np.testing.assert_array_equal(np.asarray(sub_len), np.asarray(sub_len2))
    for e in range(cfg.n_enc_exits):
        rt, rn = ctc.greedy_decode_ids(ref_ids[e], sub_len)
        gt, gn = ctc.greedy_decode_ids(got_ids[e], sub_len)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(gt))
        np.testing.assert_array_equal(np.asarray(rn), np.asarray(gn))
