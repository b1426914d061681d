#!/usr/bin/env python
"""Offline WER scorer over inference transcripts.

The reference prints `EXPECTED:` / `BEAM_OUT_ n :` pairs and scores WER
outside the repo (SURVEY.md §4). This tool closes that loop for both
frameworks' output format:

    python inference.py ... | tee decode.log
    python tools/score_wer.py decode.log

Prints corpus WER per exit (and for gated output).
"""

import argparse
import re
import sys

sys.path.insert(0, ".")

from early_exit_tpu.utils.metrics import WerAccumulator

EXPECTED = re.compile(r"EXPECTED:\s*(.*)$")
BEAM = re.compile(r"BEAM_OUT_\s*(\d+)\s*:\s*(.*)$")
GATED = re.compile(r"GATED_OUT \(exit (\d+)\):\s*(.*)$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="-")
    args = ap.parse_args()
    f = sys.stdin if args.log == "-" else open(args.log)

    refs = []           # EXPECTED lines in order
    hyps = {}           # exit -> list of (ref_index, hyp)
    gated = []          # (ref_index, hyp)
    per_exit_count = {}
    for line in f:
        m = EXPECTED.search(line)
        if m:
            refs.append(m.group(1).strip())
            continue
        m = BEAM.search(line)
        if m:
            e = int(m.group(1))
            idx = per_exit_count.get(e, 0)
            per_exit_count[e] = idx + 1
            hyps.setdefault(e, []).append((idx, m.group(2).strip()))
            continue
        m = GATED.search(line)
        if m:
            gated.append((len(gated), m.group(2).strip()))

    if not refs:
        sys.exit("no EXPECTED lines found")
    for e in sorted(hyps):
        acc = WerAccumulator()
        for idx, hyp in hyps[e]:
            if idx < len(refs):
                acc.add(refs[idx], hyp)
        print(f"exit {e}: WER {100 * acc.value:.2f}% "
              f"({acc.utterances} utts, {acc.words} ref words)")
    if gated:
        acc = WerAccumulator()
        for idx, hyp in gated:
            if idx < len(refs):
                acc.add(refs[idx], hyp)
        print(f"gated: WER {100 * acc.value:.2f}% ({acc.utterances} utts)")


if __name__ == "__main__":
    main()
