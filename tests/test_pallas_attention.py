"""Pallas fused attention vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.nn import core as nn
from early_exit_tpu.ops.pallas import attention as pattn


def _ref_attention(q, k, v, mask):
    B, H, T, dh = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
    s = jnp.where(mask[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_fused_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, H, T, dh = 2, 4, 24, 16
    q = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32))
    mask = jnp.asarray(
        np.arange(T)[None, :] < np.asarray([[T], [T - 9]]))
    out = pattn.fused_attention(q, k, v, mask, interpret=True)
    ref = _ref_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_mha_pallas_matches_nn_mha():
    rng = np.random.RandomState(1)
    B, T, D, H = 2, 16, 32, 4
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = nn.mha_init(jax.random.PRNGKey(0), D)
    mask = jnp.asarray(np.arange(T)[None, :] < np.asarray([[T], [11]]))
    ref = nn.mha(p, x, x, H, key_mask=mask)
    out = pattn.mha_pallas(p, x, H, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)
