"""Real multi-process distributed training validation (slow).

Runs tools/multiprocess_smoke.py: 2 OS processes x 4 local CPU devices
-> one global (replica=2, data=2, model=2) mesh with the replica axis
crossing the process boundary (the DCN layout, parallel/mesh.py), full
train steps with per-process local batch feeding, loss required equal to
a single-process run. See SURVEY.md §2.3.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multiprocess_training_matches_single_process():
    env = dict(os.environ)
    # the tool manages its own platform/device-count setup
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiprocess_smoke.py")],
        capture_output=True, text=True, timeout=570, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "multiprocess_smoke ok" in r.stdout
