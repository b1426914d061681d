import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.nn import core as nn


def test_dwconv_custom_vjp_matches_autodiff():
    """The hand-written depthwise-conv VJP must equal autodiff of the
    underlying lax conv on a single device."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 17, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 1, 8).astype(np.float32))

    def plain(x, w):
        k = w.shape[0]
        return jax.lax.conv_general_dilated(
            x, w, (1,), [((k - 1) // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=x.shape[-1])

    def loss_custom(x, w):
        return jnp.sum(jnp.sin(nn._dwconv_core(x, w)))

    def loss_plain(x, w):
        return jnp.sum(jnp.sin(plain(x, w)))

    gx1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-5)


def test_dwconv_even_kernel():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 1, 4).astype(np.float32))
    y = nn._dwconv_core(x, w)
    assert y.shape == x.shape
    gx, gw = jax.grad(lambda a, b: jnp.sum(nn._dwconv_core(a, b) ** 2),
                      argnums=(0, 1))(x, w)
    # numerical check on a few weight entries
    eps = 1e-3
    for idx in [(0, 0, 0), (3, 0, 2)]:
        wp = w.at[idx].add(eps)
        wm = w.at[idx].add(-eps)
        f = lambda ww: float(jnp.sum(nn._dwconv_core(x, ww) ** 2))
        num = (f(wp) - f(wm)) / (2 * eps)
        np.testing.assert_allclose(float(gw[idx]), num, rtol=1e-2)


def test_layer_norm_matches_torch_semantics():
    import pytest
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 16).astype(np.float32)
    p = nn.layer_norm_init(16)
    ours = nn.layer_norm(p, jnp.asarray(x))
    ln = torch.nn.LayerNorm(16, eps=1e-5)
    ref = ln(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_masked_batch_norm_train_and_eval():
    p, s = nn.batch_norm_init(4)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
    mask = jnp.asarray([[True] * 6, [True] * 3 + [False] * 3])
    y, s2 = nn.masked_batch_norm(p, s, x, mask, train=True)
    # normalised over valid positions only
    valid = np.concatenate([np.asarray(x)[0], np.asarray(x)[1, :3]])
    yv = np.concatenate([np.asarray(y)[0], np.asarray(y)[1, :3]])
    np.testing.assert_allclose(yv.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(yv.std(0), 1.0, atol=1e-2)
    # eval mode uses running stats and leaves state unchanged
    y_eval, s3 = nn.masked_batch_norm(p, s2, x, mask, train=False)
    assert s3 is s2


def test_sinusoidal_pe_matches_reference_formula():
    pe = np.asarray(nn.sinusoidal_pe(50, 16))
    pos, i = 7, 3
    np.testing.assert_allclose(
        pe[pos, 2 * i], np.sin(pos * np.exp(2 * i * (-np.log(10000.0) / 16))),
        rtol=1e-5)
    np.testing.assert_allclose(
        pe[pos, 2 * i + 1],
        np.cos(pos * np.exp(2 * i * (-np.log(10000.0) / 16))), rtol=1e-5)


def test_mha_bf16_softmax_close_to_fp32():
    import jax.numpy as jnp
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 12, 32).astype(np.float32))
    p = nn.mha_init(jax.random.PRNGKey(0), 32)
    mask = jnp.asarray(np.arange(12)[None, :] < np.asarray([[12], [8]]))
    a = nn.mha(p, x, x, 4, key_mask=mask)
    b = nn.mha(p, x, x, 4, key_mask=mask, compute_dtype=jnp.bfloat16,
               softmax_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.08)
