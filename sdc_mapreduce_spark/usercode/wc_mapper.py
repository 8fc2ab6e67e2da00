#!/usr/bin/env python3
"""Word-count mapper honoring the reference's user-code contract: text lines
on stdin, ``"key value"`` pairs on stdout (contract per reference
src/worker/python_executor.h:10-28; semantics per src/app/mapper.py:4-18 —
whitespace tokens, keep only str.isalnum(), emit count 1). Written fresh for
this engine; runs under ``rdd.pipe``.
"""

import sys


def main() -> None:
    out = sys.stdout
    for line in sys.stdin:
        for token in line.split():
            if token.isalnum():
                out.write(f"{token} 1\n")


if __name__ == "__main__":
    main()
