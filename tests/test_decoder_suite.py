import numpy as np
import jax.numpy as jnp

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.decoding.api import DecoderSuite

CFG = ModelConfig(vocab_size=6, blank_id=0)


def _peaky(path, V=6):
    lp = np.full((1, len(path), V), -10.0, np.float32)
    for t, s in enumerate(path):
        lp[0, t, s] = -1e-3
    return jnp.asarray(lp)


def test_suite_greedy_and_prefix_agree_on_peaky():
    suite = DecoderSuite(CFG, beam_size=4)
    lp = _peaky([0, 2, 2, 0, 3, 0, 1])
    lens = jnp.asarray([7])
    g_toks, g_n = suite.greedy(lp, lens)
    p_toks, p_n, _ = suite.ctc_prefix(lp, lens)
    g = [int(t) for t in np.asarray(g_toks[0])[:int(g_n[0])]]
    p = [int(t) for t in np.asarray(p_toks[0])[:int(p_n[0])]]
    assert g == p == [2, 3, 1]


def test_suite_align():
    suite = DecoderSuite(CFG)
    lp = _peaky([0, 2, 0, 3, 0])[0]
    starts, ends, score = suite.align(lp, jnp.asarray([2, 3]))
    np.testing.assert_array_equal(starts, [1, 3])
    # token 2's span runs until token 3 advances; token 3 absorbs the
    # trailing blank frame (torchaudio merge_repeats convention)
    np.testing.assert_array_equal(ends, [2, 4])
