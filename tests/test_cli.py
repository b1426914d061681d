"""End-to-end CLI smoke: tiny synthetic train run, checkpoint, averaged
inference — exercising the same surface as the reference CLIs."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_FLAGS = [
    "--synthetic_data", "true", "--bpe", "false",
    "--batch_size", "8", "--n_batch_split", "1",
    "--d_model", "16", "--n_heads", "2", "--d_feed_forward", "32",
    "--n_enc_exits", "2", "--n_enc_layers_per_exit", "1",
    "--depthwise_kernel_size", "3", "--drop_prob", "0.0",
    "--compute_dtype", "float32",
]


def _run(args, cwd):
    env = dict(os.environ, EET_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=420)


@pytest.mark.slow
def test_train_then_infer(tmp_path):
    r = _run([os.path.join(REPO, "train.py"), "--decoder_mode", "ctc",
              "--model_type", "early_conformer", "--n_epochs", "1",
              "--warmup", "20", "--save_model_dir", "trained_model",
              *TINY_FLAGS], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "LOSS_TOTAL-0" in r.stdout
    assert os.path.exists(tmp_path / "trained_model" / "mod000-transformer")
    assert os.path.exists(tmp_path / "runs" / "metrics.jsonl")

    r2 = _run([os.path.join(REPO, "inference.py"), "--decoder_mode", "ctc",
               "--model_type", "early_conformer",
               "--load_model_path",
               str(tmp_path / "trained_model" / "mod000-transformer"),
               *TINY_FLAGS], str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "EXPECTED:" in r2.stdout
    assert "BEAM_OUT_ 1" in r2.stdout
    assert "WER exit 1" in r2.stdout


def test_inference_requires_checkpoint(tmp_path):
    r = _run([os.path.join(REPO, "inference.py"), "--decoder_mode", "ctc",
              *TINY_FLAGS], str(tmp_path))
    assert r.returncode != 0
    assert "Invalid model loading config" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_resume_falls_back_to_complete_pair(tmp_path):
    """A crash while writing the optimizer checkpoint leaves an orphaned
    model file; auto-resume must fall back to the newest COMPLETE
    (model + optimizer) pair instead of restarting the Noam schedule at
    step 0 (the warmup-LR spike wrecks the model; BENCH_NOTES AED run)."""
    import re

    moddir = str(tmp_path / "m")
    r = _run([os.path.join(REPO, "train.py"), "--decoder_mode", "ctc",
              "--n_epochs", "2", "--save_model_dir", moddir,
              *TINY_FLAGS], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    # simulate the crash: epoch 1's optimizer file never landed
    os.remove(os.path.join(moddir, "lr001-transformer"))
    r = _run([os.path.join(REPO, "train.py"), "--decoder_mode", "ctc",
              "--n_epochs", "3", "--save_model_dir", moddir,
              *TINY_FLAGS], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "no optimizer state" in r.stdout
    m = re.search(r"auto-resume from epoch (\d+) \(step (\d+)\)", r.stdout)
    assert m and m.group(1) == "0" and int(m.group(2)) > 0, r.stdout[-2000:]


def test_profile_trace_flags_parse():
    from early_exit_tpu.cli import get_args

    args, _, _, _, _ = get_args(
        ["--decoder_mode", "ctc", "--bpe", "false",
         "--profile_trace", "/tmp/tr", "--profile_steps", "3"])
    assert args.profile_trace == "/tmp/tr" and args.profile_steps == 3
    args, _, _, _, _ = get_args(["--decoder_mode", "ctc", "--bpe", "false"])
    assert args.profile_trace is None and args.profile_steps == 10
