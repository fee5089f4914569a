#!/usr/bin/env python
"""Attention saved-probs A/B on the full DINO step (round-4, region 3:
Pallas attention 22.7 ms vs ~19 ms head_dim cap).

The wide-softmax backward recomputes QK^T scores and the masked softmax
from qkv (flash-style). "savep" makes the forward kernel also emit the
bf16 probabilities so the backward drops that recompute: 4 dots per head
instead of 5 and no backward softmax pass, for ~190 MB/step of p traffic
(~0.4 ms at HBM peak).

Measured result (BENCH.md round 4): 101.5 -> 99.3 ms at b96 — ADOPTED in
core/tuned.py, so "base" here now means "the adopted config" and the
historical A/B arms are expressed as overrides.

Usage: python scripts/exp_attn4.py [batch] [variant ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_harness import main  # noqa: E402

VARIANTS = {
    "base": {},  # adopted config (attn_save_probs=True via core/tuned.py)
    "recompute": {"attn_save_probs": False},  # the pre-round-4 backward
}

if __name__ == "__main__":
    main(VARIANTS)
