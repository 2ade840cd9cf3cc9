#!/usr/bin/env python
"""Refresh the committed single-chip truth CSV from the last FRESH bench run.

Reads benchmarks/results/cache/last_result.json (written incrementally by
bench.py's inner run) and rewrites benchmarks/results/tpu_truth_r05.csv so
the committed truth rows track the code as currently shipped (VERDICT r3
stretch #8, VERDICT r4 #2).  Refuses to publish a result flagged `cached`
— stale republications stay out of the committed record.  A `partial`
result publishes whatever rows completed (each row is a real fresh
measurement; the partial flag only means later stages didn't run).

Run by scripts/chipqueue.sh right after the headline bench; the round-end
driver commit picks the CSV up.
"""

import csv
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAST = os.path.join(REPO, "benchmarks", "results", "cache",
                    "last_result.json")
OUT = os.path.join(REPO, "benchmarks", "results", "tpu_truth_r05.csv")


def main() -> int:
    try:
        with open(LAST) as fh:
            res = json.load(fh)
    except (OSError, ValueError) as e:
        print(f"no bench result to publish: {e}", file=sys.stderr)
        return 1
    if res.get("cached"):
        print("last bench result is a flagged cached republication "
              f"({res.get('cache_reason')!r}); refusing to publish",
              file=sys.stderr)
        return 1
    # last_result.json holds the last REAL measurement — which may be from
    # a previous round if the bench has been falling back since.  Only
    # publish a result written moments ago (the queue runs this right
    # after bench.py).
    import time
    age_s = time.time() - os.path.getmtime(LAST)
    if age_s > 3 * 3600:
        print(f"last bench result is {age_s / 3600:.1f} h old — not from "
              "this queue run; refusing to publish", file=sys.stderr)
        return 1
    d = res["detail"]

    def row(config, ours, ref):
        vs = round(ref / ours, 3) if (ref and ours) else None
        return (config, ours, ref if ref else None, vs)

    rows = [
        row(config, ours, ref)
        for config, ours, ref in (
            ("narrow p=1073741789 n=4", d.get("our_s_per_iteration"),
             d.get("reference_seq_s_per_iteration")),
            ("narrow p=1073741789 n=32", d.get("n32_s_per_iteration"),
             d.get("n32_reference_s_per_iteration")),
            ("gf2 p=2 n=128 (bitsliced)", d.get("gf2_n128_s_per_iteration"),
             d.get("gf2_n128_reference_s_per_iteration")),
            ("gf2 p=2 n=256 (bitsliced)", d.get("gf2_n256_s_per_iteration"),
             None),
            ("wide p=2^61-1 n=4 (ref cannot run)",
             d.get("wide_p61_s_per_iteration"), None),
            ("gf2 51M-nnz n=128 (3M x 2M)",
             d.get("gf2_51m_n128_s_per_iteration"), None),
            ("gf2 51M-nnz n=256 (3M x 2M)",
             d.get("gf2_51m_n256_s_per_iteration"), None),
        )
        if ours is not None
    ]
    if not rows:
        print("no completed rows in the last result; nothing to publish",
              file=sys.stderr)
        return 1

    with open(OUT, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["config", "ours_s_per_iteration",
                    "reference_seq_s_per_iteration",
                    "vs_reference_same_config"])
        w.writerows(rows)
    print(f"wrote {OUT}" + (" (partial)" if res.get("partial") else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
