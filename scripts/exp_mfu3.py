#!/usr/bin/env python
"""Per-fusion MFU table: join the device trace's conv-fusion times with the
optimized HLO's dot/convolution shapes to compute achieved FLOP/s per fusion
against the measured 201 TFLOP/s bf16 chain peak (BENCH.md exp_gemm).

Answers: which GEMM fusions are the 55%-MXU ones the cost model reports,
and how many milliseconds they leave on the table.

Usage: python scripts/exp_mfu3.py /tmp/trace3_b128 /tmp/hlo_b128.txt
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo/scripts")

from exp_trace3 import parse  # noqa: E402

PEAK = 201e12  # measured bf16 GEMM-chain peak, scripts/exp_gemm.py

def main():
    tracedir, hlopath = sys.argv[1], sys.argv[2]
    # --- collect fusion -> [dot/conv lines] from HLO
    comp_of = {}   # fusion name -> computation name
    fusion_lines = {}
    with open(hlopath) as f:
        text = f.read()
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*? fusion\([^\n]*?calls=%([\w.\-]+)", text):
        comp_of[m.group(1)] = m.group(2)
    # computation bodies: line-based scan ("%name (params) -> ret {" ... "}")
    bodies, headers = {}, {}
    cur, buf = None, []
    head = re.compile(r"^%([\w.\-]+) \(.*\{$")
    for line in text.splitlines():
        if cur is None:
            m = head.match(line)
            if m:
                cur, buf = m.group(1), []
                headers[cur] = line
        elif line.startswith("}"):
            bodies[cur] = "\n".join(buf)
            cur = None
        else:
            buf.append(line)

    import numpy as np

    shape_pat = re.compile(r"%([\w.\-]+)(?::| =) \(?(?:bf16|f32|s32|u8|pred)\[([\d,]*)\]")

    def gemm_flops(comp: str, header: str) -> int:
        """Sum 2·MNK over dot/convolution ops in a fused computation.

        Operand shapes come from a per-computation symbol table (params are
        typed in the header; instructions on their defining lines). Valid for
        single-contraction GEMMs with no true batch dims — every ViT dot
        here — via FLOPs = 2·√(prod(out)·prod(lhs)·prod(rhs))."""
        body = bodies.get(comp, "")
        sym = {}
        for m in shape_pat.finditer(header + "\n" + body):
            dims = [int(x) for x in m.group(2).split(",")] if m.group(2) else []
            sym[m.group(1)] = dims
        fl = 0
        for line in body.splitlines():
            # recurse into nested fusions (e.g. fc1+gelu nested inside the
            # fc2+LN-stats kOutput fusion)
            nm = re.search(r" fusion\(.*?calls=%([\w.\-]+)", line)
            if nm:
                fl += gemm_flops(nm.group(1), headers.get(nm.group(1), ""))
                continue
            if " dot(" not in line and " convolution(" not in line:
                continue
            mo = re.search(r"= (?:bf16|f32)\[([\d,]+)\]", line)
            ops = re.findall(r"[( ]%([\w.\-]+)", line.split("(", 1)[1])
            if not mo or len(ops) < 2:
                continue
            out = [int(x) for x in mo.group(1).split(",")]
            lhs, rhs = sym.get(ops[0]), sym.get(ops[1])
            if not lhs or not rhs:
                continue
            po, pl_, pr = (int(np.prod(s)) for s in (out, lhs, rhs))
            fl += 2 * int(round((pl_ * pr * po) ** 0.5))
        return fl

    events = parse(tracedir)
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e["args"].get("hlo_category") == "convolution fusion":
            name = e["args"].get("deduplicated_name") or e.get("name", "?")
            agg[name][0] += e.get("dur", 0) / 1e3 / 3
            agg[name][1] += 1
    rows = []
    tot_ms = tot_floor = 0.0
    for name, (ms, n) in agg.items():
        base = name.split("/")[-1]
        comp = comp_of.get(base)
        fl = gemm_flops(comp, headers.get(comp, '')) * n // 3 if comp else 0
        mfu = fl / (ms / 1e3) / PEAK if ms and fl else 0.0
        floor = fl / PEAK * 1e3
        tot_ms += ms
        tot_floor += floor
        rows.append((ms, floor, mfu, n, base))
    rows.sort(reverse=True)
    print(f"{'ms/step':>8s} {'floor':>7s} {'MFU':>5s} {'n':>5s}  name")
    for ms, floor, mfu, n, base in rows[:30]:
        print(f"{ms:8.3f} {floor:7.3f} {mfu*100:4.0f}% {n:5d}  {base[:70]}")
    print(f"\nTOTAL conv-fusion: {tot_ms:.1f} ms/step, shape-FLOP floor "
          f"{tot_floor:.1f} ms @ {PEAK/1e12:.0f} TF/s "
          f"→ region MFU {tot_floor/tot_ms*100 if tot_ms else 0:.0f}%")


if __name__ == "__main__":
    main()
