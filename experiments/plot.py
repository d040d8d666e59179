#!/usr/bin/env python3
"""Plot layer — equivalent of the reference's log/dataextractor scripts
(log/final/dataextractor.py, log/final/main.py, log/stage/*/plot.py).

The reference regex-scrapes accuracy series out of redirected stdout logs;
here the sweep harness already emits structured jsonl, so this just renders
accuracy-vs-value curves to a PDF/PNG.

Usage: python experiments/plot.py results.jsonl -o accuracy.pdf
"""

import argparse
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", nargs="+", help="sweep result files")
    ap.add_argument("-o", "--output", default="accuracy.pdf")
    ap.add_argument("--metric", default="accuracy")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = defaultdict(list)
    for path in args.jsonl:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rec = json.loads(line)
                if args.metric in rec and "value" in rec:
                    series[rec.get("sweep", path)].append(
                        (rec["value"], rec[args.metric]))

    fig, ax = plt.subplots(figsize=(6, 4))
    for name, pts in sorted(series.items()):
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], "o-", label=name)
    ax.set_xlabel("sweep value")
    ax.set_ylabel(args.metric)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"wrote {args.output} ({sum(len(v) for v in series.values())} points)")


if __name__ == "__main__":
    main()
