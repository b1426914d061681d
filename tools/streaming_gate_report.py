#!/usr/bin/env python
"""Gated-streaming escalation report (VERDICT r4 item 7).

Runs `inference.py --streaming --exit_threshold T` over a threshold
sweep on a reference-scale corpus where exits genuinely differ, parses
the per-chunk escalation histogram + WER each run prints, and writes
one JSON report. Also runs the ungated streaming ladder (all exits) as
the quality frame.

    python tools/streaming_gate_report.py \
        --ckpt /tmp/refscale_v2/model_seed1/mod095-transformer \
        --data_root /tmp/refscale_v2/corpus \
        --out reports/streaming_gated_v2.json \
        --thresholds 0.5,0.7,0.85,0.95

The serving claim under test (reference has no streaming; the batch
gate's analogue is reference inference.py:66-72 always-all-exits):
per-chunk confidence gating keeps WER near the deep exit's while most
chunks stop at the fast exit — and on hard audio the gate must
actually escalate (r3's committed evals only ever showed
100%-at-exit-1 on easy audio).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(args, extra):
    cmd = [sys.executable, os.path.join(REPO, "inference.py"),
           "--decoder_mode", "ctc", "--streaming", "true",
           "--load_model_path", args.ckpt,
           "--data_root", args.data_root,
           "--eval_splits", args.splits,
           "--batch_size", str(args.batch_size),
           "--n_workers", "2",
           "--compute_dtype", "bfloat16"] + args.passthrough + extra
    print("+", " ".join(cmd), flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True)
    if p.returncode != 0:
        print(p.stdout[-2000:])
        print(p.stderr[-2000:])
        raise RuntimeError(f"leg failed rc={p.returncode}")
    return p.stdout


def parse(out):
    """Parse per-split streaming WER lines + escalation histograms."""
    res = {}
    for m in re.finditer(
            r"^(\S+) streaming exit histogram \(chunks per exit\): (.*)$",
            out, re.M):
        # the histogram prints as a python dict with int keys
        res.setdefault(m.group(1), {})["exit_histogram"] = {
            str(k): v for k, v in ast.literal_eval(m.group(2)).items()}
    for m in re.finditer(
            r"^(\S+) streaming WER exit (\d+): ([\d.]+)% \((\d+) utts\)"
            r"(?: \(gated: mean exit ([\d.]+)/(\d+), (\d+)% of chunks at "
            r"exit 1\))?", out, re.M):
        split = m.group(1)
        d = res.setdefault(split, {})
        d.setdefault("wer_pct", {})[f"exit{m.group(2)}"] = float(m.group(3))
        d["eval_utts"] = int(m.group(4))
        if m.group(5) is not None:
            d["mean_exit"] = float(m.group(5))
            d["pct_chunks_at_exit1"] = int(m.group(7))
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--splits", default="test-clean,test-other")
    ap.add_argument("--thresholds", default="0.5,0.7,0.85,0.95")
    ap.add_argument("--gate_score", default="maxprob")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(
        REPO, "reports", "streaming_gated.json"))
    # anything after the known flags is handed to inference.py verbatim
    # (non-default dims, --streaming_chunk_s, ... — the tool otherwise
    # assumes the reference architecture)
    args, args.passthrough = ap.parse_known_args(argv)

    report = {"ckpt": args.ckpt, "data_root": args.data_root,
              "gate_score": args.gate_score}
    report["ungated_all_exits"] = parse(run_leg(args, []))
    sweep = {}
    for t in [float(x) for x in args.thresholds.split(",") if x]:
        sweep[str(t)] = parse(run_leg(
            args, ["--exit_threshold", str(t),
                   "--gate_score", args.gate_score]))
    report["gated"] = sweep
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
