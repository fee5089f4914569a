#!/usr/bin/env python
"""Remat-policy A/B on the full DINO step (round-4, region 1 of the
round-3 closing accounting).

The named GEMM slack: XLA's backward dgrad+wgrad+dbias multi-output
fusions run at 56-79% MFU (9.7 ms over the shape-FLOP floor at b96).
Flag-level splitting and Pallas VJP overrides both measured negative
(BENCH.md round 3). This experiment tries the remaining shape: a
jax.checkpoint policy on each unrolled block, which changes WHICH forward
ops get recomputed adjacent to the backward GEMMs — i.e. restructures the
fusion groups the emitter forms, at the cost of recompute FLOPs.

Measured result (BENCH.md round 4): every variant loses 10-14 ms —
region 1 closed as irreducible at the jax/XLA level.

Usage: python scripts/exp_remat4.py [batch] [variant ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_harness import main  # noqa: E402

VARIANTS = {
    "base": {},
    "dots": {"remat_blocks": True, "remat_policy": "dots_saveable"},
    "nobatch": {
        "remat_blocks": True,
        "remat_policy": "dots_with_no_batch_dims_saveable",
    },
    "full": {"remat_blocks": True, "remat_policy": None},
    # dots_saveable + the named Pallas attention output: the only recompute
    # left is pure elementwise (LN/GELU/bias/residual) — the cheapest
    # possible restructuring of the backward fusion groups.
    "named": {"remat_blocks": True,
              "remat_policy": "dots_saveable+attn_out"},
}

if __name__ == "__main__":
    main(VARIANTS)
