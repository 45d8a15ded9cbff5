#!/usr/bin/env python3
"""Golden-output comparator with f5c's float tolerance.

Equivalent of the reference's awk comparators (scripts/test.awk,
scripts/test.sh handle_tests): exact match on string columns, float
columns pass when |x - truth| <= 0.1*|truth| + 0.02, and at most
--max-deviant fraction of rows may deviate.

Usage:
  python scripts/compare_tsv.py ours.tsv truth.tsv \
      --float-cols 5,6,7 [--max-deviant 0.05] [--skip-header]
"""

from __future__ import annotations

import argparse
import sys


def rows(path):
    with open(path) as f:
        for line in f:
            yield line.rstrip("\n").split("\t")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("truth")
    ap.add_argument("--float-cols", default="",
                    help="comma-separated 0-based float column indices")
    ap.add_argument("--max-deviant", type=float, default=0.0,
                    help="fraction of rows allowed to deviate "
                         "(scripts/test.sh:47-57 uses 0.05 on big sets)")
    ap.add_argument("--skip-header", action="store_true")
    args = ap.parse_args()
    fcols = {int(c) for c in args.float_cols.split(",") if c != ""}

    n = 0
    bad = 0
    it_a, it_b = rows(args.ours), rows(args.truth)
    if args.skip_header:
        next(it_a, None)
        next(it_b, None)
    for a, b in zip(it_a, it_b):
        n += 1
        if len(a) != len(b):
            bad += 1
            continue
        ok = True
        for i, (x, y) in enumerate(zip(a, b)):
            if i in fcols:
                try:
                    xv, yv = float(x), float(y)
                except ValueError:
                    ok = False
                    break
                if abs(xv - yv) > 0.1 * abs(yv) + 0.02:
                    ok = False
                    break
            elif x != y:
                ok = False
                break
        if not ok:
            bad += 1
    extra = sum(1 for _ in it_a) + sum(1 for _ in it_b)
    if extra:
        print(f"FAIL: row counts differ by {extra}", file=sys.stderr)
        return 1
    frac = bad / n if n else 0.0
    status = "PASS" if frac <= args.max_deviant else "FAIL"
    print(f"{status}: {bad}/{n} rows deviate "
          f"({frac:.2%}, allowed {args.max_deviant:.0%})", file=sys.stderr)
    return 0 if status == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
