#!/usr/bin/env python
"""Plot training curves from runs/metrics.jsonl.

Modern replacement for the reference's vestigial graph.py (which plots
result/*.txt files nothing writes, graph.py:23-32): reads the metrics
stream the trainer actually produces.

    python tools/plot_metrics.py runs/metrics.jsonl --out loss.png
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", nargs="?", default="runs/metrics.jsonl")
    ap.add_argument("--key", default="loss")
    ap.add_argument("--out", default=None,
                    help="Write a PNG (requires matplotlib); otherwise "
                         "print an ASCII sparkline summary.")
    args = ap.parse_args()

    steps, values = [], []
    with open(args.metrics) as f:
        for line in f:
            rec = json.loads(line)
            if args.key in rec:
                steps.append(rec["step"])
                values.append(rec[args.key])
    if not values:
        print(f"no '{args.key}' entries in {args.metrics}")
        return

    if args.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(8, 4))
        plt.plot(steps, values)
        plt.xlabel("step")
        plt.ylabel(args.key)
        plt.grid(True, alpha=0.3)
        plt.tight_layout()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        lo, hi = min(values), max(values)
        blocks = "▁▂▃▄▅▆▇█"
        span = (hi - lo) or 1.0
        line = "".join(blocks[min(int((v - lo) / span * 7.999), 7)]
                       for v in values[-100:])
        print(f"{args.key}: n={len(values)} first={values[0]:.4f} "
              f"last={values[-1]:.4f} min={lo:.4f} max={hi:.4f}")
        print(line)


if __name__ == "__main__":
    main()
