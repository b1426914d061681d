"""tools/escalation_report.py: the escalation-evidence contract.

The report is VERDICT r4 item 4's deliverable — per-utterance exit
choices correlated with ground-truth difficulty, across an operating-
curve sweep. This pins the output format and the invariants: histograms
are distributions, buckets cover every utterance, tightening the first
reachable threshold escalates monotonically, and SyntheticDataset
surfaces per-utterance sigma.
"""

import json
import os

import numpy as np
import pytest


TINY = {"d_model": 32, "n_enc_exits": 2, "n_enc_layers_per_exit": 1,
        "n_heads": 4, "d_feed_forward": 64, "depthwise_kernel_size": 7}


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    import jax

    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.training import checkpoint
    from tools import escalation_report

    tmp = tmp_path_factory.mktemp("esc")
    cfg = ModelConfig(**TINY)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(tmp, "mod000-transformer")
    checkpoint.save_pytree({"params": params, "model_state": state}, ckpt)

    calib = {"score": "maxprob",
             "thresholds": [0.5, 0.0],
             "temperatures": [1.0, 1.0],
             "tokenizer": "assets/spm/synth.bpe-256.model",
             "bench_eval": {"min_words": 2, "max_words": 3,
                            "noise": 0.02, "noise_hi": 0.5}}
    calib_path = os.path.join(tmp, "calib.json")
    with open(calib_path, "w") as f:
        json.dump(calib, f)
    out = os.path.join(tmp, "esc.json")
    rep = escalation_report.main(
        ["--ckpt", ckpt, "--calib", calib_path, "--out", out,
         "--n_utts", "16", "--batch_size", "8", "--n_buckets", "2",
         "--sweep", "0.0,0.9",
         "--model_json", json.dumps(TINY)])
    with open(out) as f:
        assert json.load(f) == rep
    return rep


def test_histogram_is_distribution_over_exits(report):
    hist = report["accept_histogram"]
    assert set(hist) == {"exit1", "exit2"}
    assert abs(sum(hist.values()) - 1.0) < 1e-6
    assert 1.0 <= report["mean_exits"] <= 2.0


def test_buckets_cover_all_utts_and_ladder_keys(report):
    assert sum(b["n_utts"] for b in report["snr_buckets"]) == 16
    for b in report["snr_buckets"]:
        assert set(b) >= {"sigma_range", "mean_chosen_exit",
                          "gated_wer_pct", "escalated_share"}
    assert set(report["exit_wer_ladder"]) == {"exit1", "exit2"}
    assert -1.0 <= report["sigma_exit_pearson"] <= 1.0
    assert -1.0 <= report["sigma_exit_spearman"] <= 1.0


def test_sweep_escalates_monotonically(report):
    """Tightening the first reachable exit's threshold can only push
    utterances deeper: mean exits is non-decreasing in the threshold,
    the all-pass point accepts everything shallow, and near-1
    thresholds escalate (almost) everything on a random-init model."""
    pts = {p["point"]: p for p in report["operating_points"]}
    assert "promoted" in pts
    lo = pts["sweep_exit1@0.0"]
    hi = pts["sweep_exit1@0.9"]
    assert lo["mean_exits"] == 1.0          # threshold 0: all accept
    assert hi["mean_exits"] >= pts["promoted"]["mean_exits"] >= \
        lo["mean_exits"]
    assert hi["escalated_share"] >= lo["escalated_share"]
    for p in pts.values():
        assert abs(sum(p["accept_histogram"].values()) - 1.0) < 1e-6


def test_synthetic_dataset_exposes_noise_sigma():
    from early_exit_tpu.data.librispeech import SyntheticDataset

    ds = SyntheticDataset(n_items=8, seed=3, noise=0.1, noise_hi=0.6)
    sigmas = [ds[i].noise_sigma for i in range(8)]
    assert all(0.1 <= s <= 0.6 for s in sigmas)
    assert len(set(round(s, 6) for s in sigmas)) > 1   # per-utt spread
    fixed = SyntheticDataset(n_items=4, seed=3, noise=0.07)
    assert all(fixed[i].noise_sigma == pytest.approx(0.07)
               for i in range(4))
