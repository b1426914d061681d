"""End-to-end dress rehearsal: disk FLAC corpus in LibriSpeech layout ->
train.py -> inference.py --decode lexicon_beam -> per-exit WER, all via
the real CLI surfaces in subprocesses (VERDICT r1 item 7).

The tool itself asserts the pipeline invariants (training loss improves,
every test utterance is decoded, WER lines present) and exits nonzero on
any break."""

import os
import shutil
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(shutil.which("g++") is None,
                       reason="no C++ toolchain"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dress_rehearsal_fast(tmp_path):
    """CTC train -> lexicon-beam decode, plus the LM-fusion leg (in-
    framework ARPA training, tools/train_arpa.py) and the confidence-
    gated dynamic-exit leg."""
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "--fast", "--legs", "ctc,lm,gated,streaming",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert '"wer_pct"' in p.stdout
    assert '"lm_wer_pct"' in p.stdout
    assert '"gated_mean_exits"' in p.stdout
    assert '"streaming_wer_pct"' in p.stdout


def test_dress_rehearsal_aed(tmp_path):
    """AED (full_conformer joint CE+CTC) train -> AED beam decode on the
    same disk corpus."""
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "--fast", "--legs", "ctc,aed", "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert '"aed_wer_pct"' in p.stdout
