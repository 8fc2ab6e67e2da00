#!/usr/bin/env python3
"""Word-count reducer honoring the reference's user-code contract:
``"key value"`` lines on stdin, one ``"key sum"`` line per key on stdout,
keys emitted in sorted order (contract per reference src/app/reducer.py:8-27).
Malformed lines (token count != 2, non-integer value) are dropped, matching
the reference's silent-skip semantics (src/app/reducer.py:11-12,21-24).
Associative + commutative, so it is safe to run over partial aggregates
(quirk Q3). Written fresh for this engine; runs under ``rdd.pipe``.
"""

import sys
from collections import defaultdict


def main() -> None:
    totals: defaultdict[str, int] = defaultdict(int)
    for line in sys.stdin:
        fields = line.split()
        if len(fields) != 2:
            continue
        key, raw = fields
        try:
            totals[key] += int(raw)
        except ValueError:
            continue
    out = sys.stdout
    for key in sorted(totals):
        out.write(f"{key} {totals[key]}\n")


if __name__ == "__main__":
    main()
