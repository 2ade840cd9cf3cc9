#!/usr/bin/env python
"""Regenerate golden parity files in tests/golden/.

Generates small random MatrixMarket matrices, runs the SEQUENTIAL C
REFERENCE binary on them (built out-of-repo, e.g. in /tmp/refbuild from
/root/reference/sequential), and stores the matrices plus the reference's
kernel-block outputs.  The test suite then asserts our solver reproduces
those kernels bit-for-bit (exact arithmetic + shared xoshiro256+ seed means
zero tolerance — SURVEY.md section 4).

The golden files are committed; this script only needs re-running if the
configurations change.

Usage: python scripts/make_goldens.py [path-to-reference-lanczos_modp]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from block_lanczos_tpu.utils import gen  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

# (name, nrows, ncols, density, seed, prime, n, right)
CONFIGS = [
    ("left_p65537_n4", 120, 80, 6, 1, 65537, 4, False),
    ("left_p65537_n1", 120, 80, 6, 1, 65537, 1, False),
    ("left_pbig_n4", 120, 80, 6, 1, 1073741789, 4, False),
    ("left_pbig_n8_odd_dims", 77, 53, 5, 7, 1073741789, 8, False),
    ("left_p3_n4", 90, 60, 4, 11, 3, 4, False),
    ("left_p2_n4", 90, 60, 4, 11, 2, 4, False),
    ("right_p65537_n4", 60, 90, 5, 3, 65537, 4, True),
    ("right_pbig_n2", 50, 75, 5, 5, 1073741789, 2, True),
    # exercised by BOTH the generic p=2 path and the bitsliced GF(2) path
    ("left_p2_n32", 200, 120, 5, 13, 2, 32, False),
]


def main():
    ref_bin = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/lanczos_modp"
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    manifest = []
    for name, nr, nc, dens, seed, prime, n, right in CONFIGS:
        mtx = os.path.join(GOLDEN_DIR, f"{name}.mtx")
        out = os.path.join(GOLDEN_DIR, f"{name}.kernel.mtx")
        gen.write_random_mtx(mtx, nr, nc, dens, seed=seed)
        cmd = [ref_bin, "--matrix", mtx, "--prime", str(prime),
               "--n", str(n), "--output-file", out]
        if right:
            cmd.append("--right")
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAILED {name}: {r.stderr[-500:]}")
            sys.exit(1)
        ok = "OK:    v != 0" in r.stdout and "OK: vt*M == 0" in r.stdout
        print(f"{name}: reference final_check {'OK' if ok else 'KO!'}")
        manifest.append((name, prime, n, right))
    with open(os.path.join(GOLDEN_DIR, "MANIFEST.txt"), "w") as fh:
        for row in manifest:
            fh.write(" ".join(map(str, row)) + "\n")


if __name__ == "__main__":
    main()
