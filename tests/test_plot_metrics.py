"""tools/plot_metrics.py — the graph.py replacement over the real
metrics stream (reference graph.py plots result/*.txt nothing writes)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _metrics_file(tmp_path, rows):
    p = tmp_path / "metrics.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


def _run(*argv):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_metrics.py"),
         *argv], capture_output=True, text=True, timeout=120)


def test_ascii_summary(tmp_path):
    p = _metrics_file(tmp_path, [
        {"step": i, "loss": 10.0 - i, "lr": 1e-3} for i in range(20)])
    r = _run(p)
    assert r.returncode == 0, r.stderr
    assert "n=20" in r.stdout and "first=10.0000" in r.stdout
    assert "last=-9.0000" in r.stdout      # 20 rows: last = 10-19 = -9.0


def test_missing_key(tmp_path):
    p = _metrics_file(tmp_path, [{"step": 0, "loss": 1.0}])
    r = _run(p, "--key", "nonexistent")
    assert r.returncode == 0
    assert "no 'nonexistent' entries" in r.stdout


def test_png_output(tmp_path):
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("matplotlib not installed")
    p = _metrics_file(tmp_path, [
        {"step": i, "loss": float(i)} for i in range(5)])
    out = str(tmp_path / "loss.png")
    r = _run(p, "--out", out)
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(out) > 0
