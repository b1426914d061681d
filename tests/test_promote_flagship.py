"""tools/promote_flagship.py: the assets-promotion contract.

bench.py's gated north-star leg loads `assets/flagship_ckpt` (bf16
params) and `assets/flagship_calib.json` (calibrated operating point +
bench_eval corpus knobs). This pins the promotion tool's output format
so a drift breaks CI, not the driver's bench run.
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def promoted(tmp_path_factory):
    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.training import checkpoint
    from tools import promote_flagship

    tmp = tmp_path_factory.mktemp("promote")
    cfg = ModelConfig()                       # reference dims, like bench
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(tmp, "mod007-transformer")
    checkpoint.save_pytree({"params": params, "model_state": state}, ckpt)

    calib = {
        "split": "dev-clean", "eval_utts": 240,
        "target_wer_delta_pp": 0.5, "final_exit_wer_pct": 7.5,
        "score": "maxprob",
        "thresholds": [0.9, 0.8, 0.7, 0.6, 0.5, 0.0],
        "temperatures": [2.0, 1.5, 1.0, 1.0, 1.0, 1.0],
        "per_score": {"maxprob": {
            "mean_exit": 2.4, "gated_wer_pct": 7.9,
            "per_exit": [{"exit": 1, "accept_share": 0.7},
                         {"exit": 2, "accept_share": 0.1},
                         {"exit": 3, "accept_share": 0.05},
                         {"exit": 4, "accept_share": 0.05},
                         {"exit": 5, "accept_share": 0.05},
                         {"exit": 6, "accept_share": 0.05}]}},
    }
    calib_path = os.path.join(tmp, "gate_calib.json")
    with open(calib_path, "w") as f:
        json.dump(calib, f)

    out_dir = os.path.join(tmp, "assets")
    os.makedirs(out_dir)
    knobs = {"min_words": 18, "max_words": 22, "noise": 0.05}
    promote_flagship.main(["--ckpt", ckpt, "--calib", calib_path,
                           "--knobs", json.dumps(knobs),
                           "--out_dir", out_dir])
    return out_dir, cfg, calib, knobs


def test_ckpt_params_cast_to_bf16_state_stays_fp32(promoted):
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.training import checkpoint

    out_dir, cfg, _, _ = promoted
    params, state = early_conformer.init(jax.random.PRNGKey(1), cfg)
    params, state = checkpoint.load_model_file(
        os.path.join(out_dir, "flagship_ckpt"), params, state)
    p_dtypes = {jnp.asarray(x).dtype
                for x in jax.tree_util.tree_leaves(params)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)}
    assert p_dtypes == {jnp.dtype(jnp.bfloat16)}
    s_dtypes = {jnp.asarray(x).dtype
                for x in jax.tree_util.tree_leaves(state)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)}
    assert jnp.dtype(jnp.bfloat16) not in s_dtypes   # BN stats stay fp32


def test_calib_json_matches_bench_contract(promoted):
    out_dir, _, calib, knobs = promoted
    with open(os.path.join(out_dir, "flagship_calib.json")) as f:
        out = json.load(f)
    # the exact keys bench.py's gated leg reads (_load_calib consumers)
    assert out["score"] == calib["score"]
    assert out["thresholds"] == calib["thresholds"]
    assert out["temperatures"] == calib["temperatures"]
    assert out["bench_eval"] == knobs
    prov = out["provenance"]
    assert prov["calib_split"] == "dev-clean"
    assert prov["dev_mean_exit"] == 2.4
    assert prov["dev_gated_wer_pct"] == 7.9
    assert prov["target_wer_delta_pp"] == 0.5
    # 70% accept at exit 1 -> cost(1) = 1 + 0.3*5 = 2.5 is minimal
    assert out["cascade_k"] == 1


def test_calib_records_tokenizer_binding(promoted):
    """The checkpoint<->tokenizer binding (VERDICT r4 items 2/6): the
    promotion names the exact BPE model file + its content hash, so
    bench.py and the CLIs decode the flagship with THAT file and fail
    loudly on a swap instead of publishing 102%-WER garbage."""
    import hashlib

    from early_exit_tpu import cli

    out_dir, _, _, _ = promoted
    with open(os.path.join(out_dir, "flagship_calib.json")) as f:
        out = json.load(f)
    # default --tokenizer resolution = the committed asset
    assert out["tokenizer"] == os.path.join("assets", "spm",
                                            "synth.bpe-256.model")
    with open(cli.OWN_BPE_MODEL, "rb") as f:
        assert out["tokenizer_sha256"] == hashlib.sha256(
            f.read()).hexdigest()


class TestFlagshipBoundTokenizer:
    """cli.flagship_bound_tokenizer: the CLIs' side of the binding."""

    def _setup(self, tmp_path, monkeypatch, *, sha_ok=True,
               tok_exists=True):
        import hashlib

        from early_exit_tpu import cli

        ckpt = tmp_path / "flagship_ckpt"
        ckpt.write_bytes(b"ckpt-bytes")
        tok = tmp_path / "bound.model"
        tok.write_bytes(b"tok-bytes")
        sha = hashlib.sha256(b"tok-bytes").hexdigest()
        calib = tmp_path / "flagship_calib.json"
        calib.write_text(json.dumps({
            "tokenizer": str(tok),
            "tokenizer_sha256": sha if sha_ok else "0" * 64}))
        if not tok_exists:
            tok.unlink()
        monkeypatch.setattr(cli, "FLAGSHIP_CKPT", str(ckpt))
        monkeypatch.setattr(cli, "FLAGSHIP_CALIB", str(calib))
        return cli, str(ckpt), str(tok)

    def test_returns_bound_model_for_flagship(self, tmp_path,
                                              monkeypatch):
        cli, ckpt, tok = self._setup(tmp_path, monkeypatch)
        assert cli.flagship_bound_tokenizer(ckpt) == tok

    def test_other_checkpoints_unaffected(self, tmp_path, monkeypatch):
        cli, _, _ = self._setup(tmp_path, monkeypatch)
        other = tmp_path / "mod001-transformer"
        other.write_bytes(b"x")
        assert cli.flagship_bound_tokenizer(str(other)) is None
        assert cli.flagship_bound_tokenizer(None) is None

    def test_hash_mismatch_fails_loudly(self, tmp_path, monkeypatch):
        cli, ckpt, _ = self._setup(tmp_path, monkeypatch, sha_ok=False)
        with pytest.raises(RuntimeError, match="binding broken"):
            cli.flagship_bound_tokenizer(ckpt)

    def test_missing_bound_file_fails_loudly(self, tmp_path,
                                             monkeypatch):
        cli, ckpt, _ = self._setup(tmp_path, monkeypatch,
                                   tok_exists=False)
        with pytest.raises(FileNotFoundError, match="binding broken"):
            cli.flagship_bound_tokenizer(ckpt)
