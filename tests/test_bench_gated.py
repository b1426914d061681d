"""bench.py's gated leg — driver-visible evidence, so its plumbing is
CI-tested at tiny dims (the driver runs the real geometry on TPU).

Covers the round-5 redesign: cascade-primary timing (phase A on all
rows + re-batched phase B), row-for-row agreement with the while_loop
gate, the tokenizer-binding verification, and the dense-WER sanity gate
that aborts the leg instead of publishing garbage north-star numbers
(the round-4 102%-WER regression)."""

import hashlib
import json
import os

import jax
import numpy as np
import pytest

import bench
from early_exit_tpu import cli

TINY = {"d_model": 32, "n_enc_exits": 2, "n_enc_layers_per_exit": 1,
        "n_heads": 4, "d_feed_forward": 64, "depthwise_kernel_size": 7}
KNOBS = {"min_words": 2, "max_words": 3, "noise": 0.02, "noise_hi": 0.4}


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.training import checkpoint

    tmp = tmp_path_factory.mktemp("bench")
    cfg = ModelConfig(**TINY)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(tmp, "mod000-transformer")
    checkpoint.save_pytree({"params": params, "model_state": state}, ckpt)
    return ckpt


def _calib(**extra):
    c = {"score": "maxprob", "thresholds": [0.5, 0.0],
         "temperatures": [1.0, 1.0], "cascade_k": 1,
         "bench_eval": KNOBS}
    c.update(extra)
    return c


def test_cascade_leg_keys_and_agreement(tiny_ckpt, monkeypatch):
    monkeypatch.setenv("EET_BENCH_ITERS", "1")
    # random-init ckpt decodes garbage; relax the sanity gate so the
    # plumbing (not the quality) is under test here
    monkeypatch.setattr(bench, "SANE_DENSE_WER", 1000.0)
    out = bench.gated_bench(0.0, ckpt_path=tiny_ckpt, calib=_calib(),
                            model_overrides=TINY, B=4, NB=2)
    assert out["gated_strategy"] == "cascade(k=1,pack=8)"
    # cascade decisions must equal the while_loop gate's on every row
    assert out["gated_cascade_agree"] == 1.0
    assert 1.0 <= out["gated_mean_exits"] <= 2.0
    assert out["gated_mean_exits_computed"] >= 1.0
    assert 0.0 <= out["gated_escalated_share"] <= 1.0
    assert out["gated_calibrated"] is True
    assert set(out) >= {"gated_rtf_x", "gated_vs_baseline",
                        "gated_dense_rtf_x", "gated_dense_padded_rtf_x",
                        "gated_speedup_vs_dense", "gated_whileloop_rtf_x",
                        "gated_wer_pct", "gated_wer_dense_pct",
                        "gated_exit_wer_ladder", "gated_eval_utts"}
    assert set(out["gated_exit_wer_ladder"]) == {"exit1", "exit2"}
    assert out["gated_eval_utts"] == 8


def test_sanity_gate_refuses_garbage_wer(tiny_ckpt, monkeypatch):
    """A random-init checkpoint decodes its eval batch at ~100% WER —
    exactly the situation round 4 published as a 2.5x north star. The
    leg must abort instead."""
    monkeypatch.setenv("EET_BENCH_ITERS", "1")
    with pytest.raises(RuntimeError, match="sanity gate"):
        bench.gated_bench(0.0, ckpt_path=tiny_ckpt, calib=_calib(),
                          model_overrides=TINY, B=4, NB=1)


def test_tokenizer_binding_mismatch_aborts(tiny_ckpt, monkeypatch):
    monkeypatch.setenv("EET_BENCH_ITERS", "1")
    calib = _calib(tokenizer=cli.OWN_BPE_MODEL,
                   tokenizer_sha256="0" * 64)
    with pytest.raises(RuntimeError, match="tokenizer content mismatch"):
        bench.gated_bench(0.0, ckpt_path=tiny_ckpt, calib=calib,
                          model_overrides=TINY, B=4, NB=1)


def test_tokenizer_binding_missing_file_aborts(tiny_ckpt, monkeypatch):
    monkeypatch.setenv("EET_BENCH_ITERS", "1")
    calib = _calib(tokenizer="assets/spm/does-not-exist.model")
    with pytest.raises(FileNotFoundError, match="binding missing"):
        bench.gated_bench(0.0, ckpt_path=tiny_ckpt, calib=calib,
                          model_overrides=TINY, B=4, NB=1)


def test_correct_binding_passes(tiny_ckpt, monkeypatch):
    monkeypatch.setenv("EET_BENCH_ITERS", "1")
    monkeypatch.setattr(bench, "SANE_DENSE_WER", 1000.0)
    with open(cli.OWN_BPE_MODEL, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    calib = _calib(tokenizer=cli.OWN_BPE_MODEL, tokenizer_sha256=sha)
    out = bench.gated_bench(0.0, ckpt_path=tiny_ckpt, calib=calib,
                            model_overrides=TINY, B=4, NB=1)
    assert out["gated_calibrated"] is True
