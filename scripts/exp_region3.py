#!/usr/bin/env python
"""Per-SUBSYSTEM device-time split: join the trace (exp_trace3 dir) with the
optimized HLO's op metadata (exp_hlo3 dump) so every fused op lands in a
named region — backbone fwd / backbone bwd / head / loss / optimizer+EMA /
multicrop / other. This replaces per-op guessing with an exact answer to
"where do the remaining milliseconds live?".

Usage: python scripts/exp_region3.py /tmp/trace3_b128 /tmp/hlo_b128.txt
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo/scripts")

from exp_trace3 import parse  # noqa: E402


def build_name_map(hlo_path: str):
    """name -> op_name metadata string for every HLO instruction."""
    pat = re.compile(r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\"")
    m = {}
    with open(hlo_path) as f:
        for line in f:
            mm = pat.search(line)
            if mm:
                m[mm.group(1)] = mm.group(2)
    return m


def region_of(op_name: str, hlo_name: str) -> str:
    if "multicrop" in op_name or "vmap" in op_name:
        return "multicrop/aug"
    bwd = "transpose(jvp" in op_name
    if "backbone" in op_name:
        return "backbone bwd" if bwd else "backbone fwd"
    if "head" in op_name or "DINOHead" in op_name:
        return "head bwd" if bwd else "head fwd"
    if hlo_name.startswith("attn"):
        return "backbone ?"
    for k in ("log_softmax", "softmax", "dino_loss", "cross_entropy",
              "center"):
        if k in op_name:
            return "loss"
    for k in ("adamw", "adam", "scale_by", "ema", "lerp", "opt_state",
              "apply_updates"):
        if k in op_name:
            return "optimizer/ema"
    return "other"


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace3_b128"
    hlo = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hlo_b128.txt"
    nm = build_name_map(hlo)
    events = parse(logdir)
    reg = defaultdict(lambda: [0.0, 0])
    unmapped = defaultdict(float)
    nsteps = 3
    for e in events:
        name = e.get("name", "")
        if name in ("0", "1", "2") or name.startswith("jit_"):
            continue
        dur = e.get("dur", 0) / 1e3 / nsteps
        op = nm.get(name, "")
        r = region_of(op, name) if op or name.startswith("attn") else "?"
        reg[r][0] += dur
        reg[r][1] += 1
        if r in ("other", "?") and dur > 0.02:
            unmapped[f"{name} :: {op[:90]}"] += dur
    tot = sum(v[0] for v in reg.values())
    for r, (ms, n) in sorted(reg.items(), key=lambda kv: -kv[1][0]):
        print(f"{r:16s} {ms:8.2f} ms/step  ({100*ms/tot:4.1f}%)  n={n//nsteps}")
    print(f"{'TOTAL':16s} {tot:8.2f} ms/step")
    print("\nbiggest other/unmapped:")
    for k, ms in sorted(unmapped.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:7.3f} ms  {k[:140]}")


if __name__ == "__main__":
    main()
