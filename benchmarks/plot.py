#!/usr/bin/env python
"""Plot scaling results (time + speedup/efficiency curves).

The analogue of the reference's benchmarks/plot.ipynb, which parses raw
timing strings and plots time and speedup vs cores/nodes.  Here the input
is the CSV written by benchmarks/scaling.py.

Usage: python benchmarks/plot.py /tmp/blanczos_scaling.csv [out.png]
"""

import csv
import sys


def main():
    if len(sys.argv) > 1 and sys.argv[1] in ("-h", "--help"):
        sys.exit(__doc__)
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/blanczos_scaling.csv"
    out = sys.argv[2] if len(sys.argv) > 2 else "scaling.png"
    rows = []
    try:
        fh = open(path)
    except OSError as e:
        sys.exit(f"{e}\n\n{__doc__}")
    with fh:
        for rec in csv.DictReader(fh):
            rows.append((int(rec["mesh_size"]),
                         float(rec["s_per_iteration"]),
                         float(rec["nnz_per_s"]),
                         float(rec["efficiency"])))
    if not rows:
        sys.exit("no data")
    base = rows[0][1]

    # always print the table (plots need matplotlib, which may be absent)
    print(f"{'mesh':>6} {'s/iter':>10} {'Mnnz/s':>10} {'speedup':>9} "
          f"{'efficiency':>11}")
    for k, t, nnzs, eff in rows:
        print(f"{k:>6} {t:>10.4f} {nnzs/1e6:>10.1f} {base/t:>9.2f} "
              f"{eff:>10.1%}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; table only")
        return

    ks = [r[0] for r in rows]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(ks, [r[1] for r in rows], "o-")
    axes[0].set_xlabel("mesh size (chips)")
    axes[0].set_ylabel("seconds / iteration")
    axes[0].set_xscale("log", base=2)
    axes[0].set_yscale("log")
    axes[0].set_title("iteration time")
    axes[0].grid(True, alpha=0.3)
    axes[1].plot(ks, [base / r[1] for r in rows], "o-", label="speedup")
    axes[1].plot(ks, ks, "k--", alpha=0.4, label="ideal")
    axes[1].set_xlabel("mesh size (chips)")
    axes[1].set_ylabel("speedup vs 1 chip")
    axes[1].set_title("scaling")
    axes[1].legend()
    axes[1].grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
