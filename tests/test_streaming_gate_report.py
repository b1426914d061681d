"""tools/streaming_gate_report.py: output-parser contract.

The tool regex-parses `inference.py --streaming` stdout (the per-split
WER lines and the gated escalation histogram printed at inference.py's
run_streaming tail). These tests pin the contract with canned output so
a print-format change breaks CI, not a 30-minute TPU sweep.
"""

import json
import subprocess
import sys

from tools.streaming_gate_report import parse

UNGATED = """\
test-clean EXPECTED: the cat sat
test-clean STREAM_OUT (exit 1): the cat sat
test-clean WER exit 1: 1.23% (240 utts)
test-clean streaming WER exit 1: 10.50% (240 utts)
test-clean streaming WER exit 2: 8.25% (240 utts)
test-other streaming WER exit 1: 30.00% (240 utts)
test-other streaming WER exit 2: 21.75% (240 utts)
"""

GATED = """\
test-clean streaming exit histogram (chunks per exit): {1: 800, 2: 0, 3: 150, 4: 0, 5: 0, 6: 50}
test-clean streaming WER exit 6: 9.10% (240 utts) (gated: mean exit 1.55/6, 80% of chunks at exit 1)
test-other streaming exit histogram (chunks per exit): {1: 300, 2: 200, 3: 200, 4: 100, 5: 100, 6: 100}
test-other streaming WER exit 6: 22.40% (240 utts) (gated: mean exit 2.60/6, 30% of chunks at exit 1)
"""


def test_parse_ungated_ladder():
    r = parse(UNGATED)
    assert r["test-clean"]["wer_pct"] == {"exit1": 10.5, "exit2": 8.25}
    assert r["test-other"]["wer_pct"] == {"exit1": 30.0, "exit2": 21.75}
    assert r["test-clean"]["eval_utts"] == 240
    # the batch path's "WER exit 1" line must NOT be swallowed
    assert "mean_exit" not in r["test-clean"]


def test_parse_gated_histogram_and_mean_exit():
    r = parse(GATED)
    c = r["test-clean"]
    assert c["exit_histogram"] == {"1": 800, "2": 0, "3": 150,
                                   "4": 0, "5": 0, "6": 50}
    assert c["wer_pct"] == {"exit6": 9.1}
    assert c["mean_exit"] == 1.55
    assert c["pct_chunks_at_exit1"] == 80
    o = r["test-other"]
    assert o["mean_exit"] == 2.6
    assert o["pct_chunks_at_exit1"] == 30
    assert sum(o["exit_histogram"].values()) == 1000


def test_parse_round_trips_json():
    # the report must be json-serializable as written (ast ints -> str keys)
    json.dumps(parse(GATED))


def test_cli_passthrough_flags_reach_inference(monkeypatch, tmp_path):
    """Unknown flags (non-default dims etc.) pass through to inference.py."""
    import tools.streaming_gate_report as sgr
    seen = []

    def fake_run(cmd, capture_output, text):
        seen.append(cmd)

        class P:
            returncode = 0
            stdout = UNGATED
            stderr = ""
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = tmp_path / "r.json"
    sgr.main(["--ckpt", "/tmp/x", "--data_root", "/tmp/d",
              "--thresholds", "0.85", "--out", str(out),
              "--d_model", "64", "--n_enc_exits", "2"])
    assert len(seen) == 2                      # ungated + one threshold
    for cmd in seen:
        assert sys.executable == cmd[0]
        i = cmd.index("--d_model")
        assert cmd[i + 1] == "64"
        assert "--n_enc_exits" in cmd
    gated_cmd = seen[1]
    assert "--exit_threshold" in gated_cmd
    report = json.loads(out.read_text())
    assert "ungated_all_exits" in report and "0.85" in report["gated"]
