#!/usr/bin/env python
"""Dump the optimized HLO of the bench step and summarize named fusions.

The round-3 trace (exp_trace3) shows the XLA GEMM region at ~600 GB/s with
some fusions (convert_reduce_fusion.52 at 184 GB/s) far off the roofline.
This maps trace op names back to HLO so the slow ones can be diagnosed.

Usage: python scripts/exp_hlo3.py [batch] [opname ...]
"""

from __future__ import annotations

import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from tpuwsi.core.compile import _SCHED_OPTS  # noqa: E402


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 96
    names = [a for a in args if not a.isdigit()]

    from bench import build

    state, step = build(batch)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    compiled = step.lower(state, b, rng).compile(
        compiler_options=dict(_SCHED_OPTS)
    )
    txt = compiled.as_text()
    with open(f"/tmp/hlo_b{batch}.txt", "w") as f:
        f.write(txt)
    print(f"wrote /tmp/hlo_b{batch}.txt ({len(txt)/1e6:.1f} MB)")

    # print the fusion root + computation body for each requested name
    for name in names:
        # find the fusion instruction line
        pat = re.compile(rf"%?{re.escape(name)} = .*")
        for m in pat.finditer(txt):
            line = m.group(0)
            print(f"\n=== {name} (instruction) ===")
            print(line[:1500])
            break
        # find its called computation
        pat2 = re.compile(
            rf"%?fused_computation[^\s]*\s.*?{re.escape(name)}", re.S
        )
        cpat = re.compile(
            rf"calls=%?([\w.\-]+)", re.S
        )
        m = pat.search(txt)
        if m:
            cm = cpat.search(m.group(0))
            if cm:
                comp = cm.group(1)
                # extract the computation definition
                start = txt.find(f"%{comp} ")
                if start == -1:
                    start = txt.find(f"{comp} ")
                if start != -1:
                    end = txt.find("\n}", start)
                    body = txt[start : end + 2]
                    print(f"--- computation {comp} ({len(body)} chars) ---")
                    print(body[:4000])


if __name__ == "__main__":
    main()
