"""Streaming ASR server (tools/serve.py): protocol + transcript parity.

The selftest spawns the TCP server in-process, streams int16 PCM over a
real socket in odd-sized pieces, and requires the final ids to equal a
local StreamingRecognizer's output on the same (dequantised) audio.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_serve_selftest():
    env = dict(os.environ, EET_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--selftest"],
        capture_output=True, text=True, timeout=290, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert '"selftest": "ok"' in r.stdout
