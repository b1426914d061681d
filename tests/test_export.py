"""AOT serving export (serving/export.py): serialize -> load -> parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import AudioConfig, ModelConfig
from early_exit_tpu.models.registry import build_model
from early_exit_tpu.serving import export as exp

CFG = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                  n_enc_exits=2, n_enc_layers_per_exit=1,
                  depthwise_kernel_size=7, vocab_size=40, n_mels=16,
                  compute_dtype="float32")
ACFG = AudioConfig(n_mels=16)


def _setup():
    model = build_model(CFG)
    params, state = model.init(jax.random.PRNGKey(0), CFG)
    return model, params, state


def _wav(b, s, seed=0):
    rng = np.random.RandomState(seed)
    wav = (rng.randn(b, s) * 0.1).astype(np.float32)
    n = np.asarray([s - 160 * i for i in range(b)], np.int32)
    return wav, n


def test_roundtrip_parity(tmp_path):
    model, params, state = _setup()
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [(2, 4000)], platforms=["cpu"])
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)

    rec = exp.ExportedRecognizer(path)
    wav, n = _wav(2, 4000)
    toks, n_tok, conf = rec(wav, n)

    serve = exp.make_serve_fn(model, CFG, ACFG, params, state)
    ref = jax.jit(serve)(jnp.asarray(wav), jnp.asarray(n))
    assert toks.shape[0] == CFG.n_enc_exits and toks.shape[1] == 2
    np.testing.assert_array_equal(toks, np.asarray(ref[0]))
    np.testing.assert_array_equal(n_tok, np.asarray(ref[1]))
    np.testing.assert_allclose(conf, np.asarray(ref[2]), atol=1e-5)
    assert np.all((conf > 0) & (conf <= 1))


def test_padding_to_covering_shape(tmp_path):
    model, params, state = _setup()
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [(2, 4000), (4, 8000)],
                                   platforms=["cpu"])
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)
    rec = exp.ExportedRecognizer(path)

    # B=1, S=3000 -> padded into the (2, 4000) program; trimmed back
    wav, n = _wav(1, 3000, seed=1)
    toks, n_tok, conf = rec(wav, n)
    assert toks.shape[1] == 1 and n_tok.shape == (CFG.n_enc_exits, 1)

    # the same utterance zero-padded by the caller gives the same decode
    wav4 = np.pad(wav, ((0, 0), (0, 1000)))
    toks2, n_tok2, _ = rec(wav4, n)
    np.testing.assert_array_equal(n_tok, n_tok2)
    for e in range(CFG.n_enc_exits):
        np.testing.assert_array_equal(toks[e, 0, :n_tok[e, 0]],
                                      toks2[e, 0, :n_tok2[e, 0]])

    # nothing covers B=8
    with pytest.raises(ValueError, match="no exported shape"):
        rec(*_wav(8, 4000))


def test_manifest_and_vocab(tmp_path):
    class Tok:
        def get_piece_size(self):
            return 6

        def id_to_piece(self, i):
            return ["<blank>", "▁he", "llo", "▁yo", "<s>", "</s>"][i]

    model, params, state = _setup()
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [(2, 4000)], platforms=["cpu"],
                                   tokenizer=Tok())
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)
    rec = exp.ExportedRecognizer(path)
    m = rec.manifest
    assert m["format"] == "eet-export-1"
    assert m["platforms"] == ["cpu"]
    assert m["n_exits"] == CFG.n_enc_exits
    assert m["shapes"]["2x4000"]["wav"] == [2, 4000]
    assert rec.detokenize([1, 2, 4, 3]) == "hello yo"


def test_symbolic_program(tmp_path):
    """One shape-polymorphic program serves any (B, S) under the bound,
    exactly matching the jit of the same fn — and the concrete bucket is
    preferred when it covers."""
    model, params, state = _setup()
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [(2, 4000)], platforms=["cpu"],
                                   symbolic_max_samples=16000)
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)
    rec = exp.ExportedRecognizer(path)
    assert "poly" in rec.manifest["shapes"]
    assert rec.manifest["n_exits"] == CFG.n_enc_exits

    serve = jax.jit(exp.make_serve_fn(model, CFG, ACFG, params, state))
    # no concrete bucket covers (3, 6000): the poly program runs it
    # unpadded, so outputs equal the direct jit bit-for-bit
    for b, s, seed in [(3, 6000, 2), (1, 9000, 3)]:
        wav, n = _wav(b, s, seed=seed)
        toks, n_tok, conf = rec(wav, n)
        ref = serve(jnp.asarray(wav), jnp.asarray(n))
        np.testing.assert_array_equal(toks, np.asarray(ref[0]))
        np.testing.assert_array_equal(n_tok, np.asarray(ref[1]))
        np.testing.assert_allclose(conf, np.asarray(ref[2]), atol=1e-5)

    # above the bound: rejected, and the error names the poly fallback
    with pytest.raises(ValueError, match="poly"):
        rec(*_wav(1, 32000))


def test_symbolic_only_bundle(tmp_path):
    model, params, state = _setup()
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [], platforms=["cpu"],
                                   symbolic_max_samples=8000)
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)
    rec = exp.ExportedRecognizer(path)
    wav, n = _wav(2, 4000)
    toks, n_tok, conf = rec(wav, n)
    assert toks.shape[0] == CFG.n_enc_exits and toks.shape[1] == 2
    with pytest.raises(ValueError):
        exp.export_recognizer(model, CFG, ACFG, params, state, [],
                              platforms=["cpu"])


def test_gated_programs(tmp_path):
    """gated=True bundles carry while_loop early-exit variants with the
    threshold as a runtime scalar; outputs match gated_apply directly."""
    import jax.numpy as jnp
    from early_exit_tpu.models import early_exit_gate
    from early_exit_tpu.ops import ctc as ctc_ops
    from early_exit_tpu.ops import frontend

    model, params, state = _setup()
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [(2, 4000)], platforms=["cpu"],
                                   symbolic_max_samples=16000,
                                   gated=True)
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)
    rec = exp.ExportedRecognizer(path)
    assert rec.manifest["gated"]

    for b, s, seed in [(2, 4000, 0), (3, 6000, 2)]:   # bucket + poly
        wav, n = _wav(b, s, seed=seed)
        for thr in (0.0, 0.99):
            toks, n_tok, chosen = rec.gated(wav, n, thr)
            assert toks.shape[0] == b and chosen.shape == (b,)
            assert np.all((chosen >= 1) & (chosen <= CFG.n_enc_exits))
            # oracle: run gated_apply on the same (padded-free) input
            feats = frontend.mel_spectrogram(
                jnp.asarray(wav), ACFG, method=ACFG.mel_method)
            lengths = frontend.mel_lengths(jnp.asarray(n),
                                           ACFG.hop_length)
            logp, chosen_ref, sub_len, _ = early_exit_gate.gated_apply(
                params, state, feats, lengths, CFG, threshold=thr,
                item_mask=(jnp.asarray(n) > 0).astype(jnp.float32))
            toks_ref, n_ref = ctc_ops.greedy_decode(
                logp, sub_len, blank=CFG.blank_id)
            np.testing.assert_array_equal(chosen, np.asarray(chosen_ref))
            np.testing.assert_array_equal(n_tok, np.asarray(n_ref))
            for i in range(b):
                np.testing.assert_array_equal(
                    toks[i, :n_tok[i]],
                    np.asarray(toks_ref)[i, :n_ref[i]])
        # threshold 0 accepts exit 1 everywhere; 0.99 escalates deeper
        # (or equal) — monotonicity of the gate in the threshold
        _, _, c_lo = rec.gated(wav, n, 0.0)
        _, _, c_hi = rec.gated(wav, n, 0.99)
        assert np.all(c_lo == 1) and np.all(c_hi >= c_lo)

    # ungated bundle refuses
    b2 = exp.export_recognizer(model, CFG, ACFG, params, state,
                               [(2, 4000)], platforms=["cpu"])
    p2 = str(tmp_path / "m2.eetx")
    exp.save_bundle(p2, b2)
    with pytest.raises(ValueError, match="gated"):
        exp.ExportedRecognizer(p2).gated(*_wav(2, 4000), 0.5)


def test_cascade_programs(tmp_path):
    """cascade_k bundles carry the two-phase programs; the consumer's
    rec.cascade orchestration (A -> host pack -> B) must reproduce
    gated_apply's per-row decisions with runtime per-exit thresholds."""
    import jax.numpy as jnp
    from early_exit_tpu.models import early_exit_gate
    from early_exit_tpu.ops import ctc as ctc_ops
    from early_exit_tpu.ops import frontend

    model, params, state = _setup()
    temps = [2.0, 1.0]
    bundle = exp.export_recognizer(model, CFG, ACFG, params, state,
                                   [(3, 4000)], platforms=["cpu"],
                                   cascade_k=1, gate_temperatures=temps)
    path = str(tmp_path / "m.eetx")
    exp.save_bundle(path, bundle)
    rec = exp.ExportedRecognizer(path)
    assert rec.manifest["cascade_k"] == 1
    assert {"cascade_a/3x4000", "cascade_b/3x4000"} <= set(
        rec.bundle.programs)

    wav, n = _wav(3, 4000, seed=4)
    feats = frontend.mel_spectrogram(jnp.asarray(wav), ACFG,
                                     method=ACFG.mel_method)
    lengths = frontend.mel_lengths(jnp.asarray(n), ACFG.hop_length)
    # thresholds spanning accept-all .. escalate-all, plus a split point
    # at the median of the model's own exit-1 confidence
    logp, sub_len, _ = model.apply(params, state, feats, lengths, CFG,
                                   train=False)
    from early_exit_tpu.models import gate_calibration
    mask = jnp.arange(logp.shape[2])[None, :] < sub_len[:, None]
    conf1 = np.asarray(gate_calibration.scaled_confidence(
        logp[0], mask, "maxprob", temps[0]))
    split_thr = float(np.median(conf1))
    for thr in ([0.0, 0.0], [0.999, 0.0], [split_thr, 0.0]):
        toks, n_tok, chosen, escalated = rec.cascade(wav, n, thr)
        logp_g, chosen_ref, sub_ref, _ = early_exit_gate.gated_apply(
            params, state, feats, lengths, CFG, threshold=thr,
            score="maxprob", temperatures=temps,
            item_mask=(jnp.asarray(n) > 0).astype(jnp.float32))
        toks_ref, n_ref = ctc_ops.greedy_decode(
            logp_g, sub_ref, blank=CFG.blank_id)
        np.testing.assert_array_equal(chosen, np.asarray(chosen_ref))
        np.testing.assert_array_equal(n_tok, np.asarray(n_ref))
        for i in range(3):
            np.testing.assert_array_equal(
                toks[i, :n_tok[i]],
                np.asarray(toks_ref)[i, :n_ref[i]])
        np.testing.assert_array_equal(escalated, chosen > 1)
    # the split threshold must actually split (else the merge path of
    # rec.cascade was not exercised)
    _, _, _, esc_split = rec.cascade(wav, n, [split_thr, 0.0])
    assert esc_split.any() and (~esc_split).any()

    with pytest.raises(ValueError, match="thresholds"):
        rec.cascade(wav, n, [0.5])
    b2 = exp.export_recognizer(model, CFG, ACFG, params, state,
                               [(2, 4000)], platforms=["cpu"])
    p2 = str(tmp_path / "m2.eetx")
    exp.save_bundle(p2, b2)
    with pytest.raises(ValueError, match="cascade_k"):
        exp.ExportedRecognizer(p2).cascade(*_wav(2, 4000), [0.5, 0.0])


def test_rejects_non_bundle(tmp_path):
    import json
    import zipfile
    path = str(tmp_path / "bad.eetx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("manifest.json", json.dumps({"format": "nope"}))
    with pytest.raises(ValueError, match="not an eet export bundle"):
        exp.load_bundle(path)
