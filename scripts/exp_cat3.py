#!/usr/bin/env python
"""Per-category top-op breakdown of an existing exp_trace3 trace dir.

Usage: python scripts/exp_cat3.py /tmp/trace3_b128 [category ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")

from exp_trace3 import analyze, parse  # noqa: E402


def main():
    logdir = sys.argv[1]
    cats = sys.argv[2:] or ["loop fusion", "data formatting", "copy-done",
                            "reduce"]
    events = parse(logdir)
    by_cat, by_op, total, span, gap = analyze(events)
    for want in cats:
        print(f"\n=== {want} ===")
        ops = [(ms, gb, n, name) for (cat, name), (ms, gb, n) in by_op.items()
               if cat == want]
        for ms, gb, n, name in sorted(ops, reverse=True)[:15]:
            bw = gb / (ms / 1e3) if ms else 0
            print(f"  {ms:7.2f} ms {gb:7.2f} GB {bw:5.0f} GB/s x{n:4d} "
                  f"{name[:100]}")


if __name__ == "__main__":
    main()
