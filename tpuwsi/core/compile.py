"""Step-compilation helpers.

The round-2 device profile (BENCH.md) showed per-op input-DMA stalls are the
systemic in-step overhead; XLA:TPU's latency-hiding scheduler recovers a
measured +2.4% on the full DINO step. The scheduler is only reachable via
per-compile ``compiler_options`` here (the XLA_FLAGS env route is parsed —
and rejected — by the local CPU XLA before the flag ever reaches the
tunneled TPU compiler).
"""

from __future__ import annotations

import hashlib
import logging
import platform

import jax


def machine_cache_dir(base: str) -> str:
    """``base`` suffixed with a fingerprint of this host's CPU.

    The persistent compile cache stores XLA:CPU AOT executables specialized
    to the COMPILE machine's feature set; jax's cache key does not include
    host CPU features, so an entry written on one machine loads on another
    ("Machine type used for XLA:CPU compilation doesn't match ... could
    lead to execution errors such as SIGILL", cpu_aot_loader.cc — observed
    round 4 when the CI host changed). Keying the directory by the CPU
    flag set makes cross-machine reuse impossible while keeping same-host
    reuse (including the tunneled-TPU executables, which dominate the
    cache's value) intact.
    """
    fp = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return f"{base}-{hashlib.sha256(fp.encode()).hexdigest()[:8]}"

_SCHED_OPTS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    # Round-3 per-fusion MFU accounting (scripts/exp_mfu3.py + exp_flags3b):
    # the GEMM region's slack concentrates in epilogue-fused backward combos
    # (reduce/broadcast + conv-output fusion, 61-77% MFU); disabling both
    # measured +2.4%/+0.3% (per-call/scanned driver) and never worse. Conv
    # INPUT fusion must stay on (-31% when off). Unknown-flag rejections
    # fall back to plain jit via the except below.
    "xla_tpu_rwb_fusion": "false",
    "xla_jf_conv_output_fusion": "false",
}


def scheduled_step(jitted):
    """Wrap a jitted step so its first TPU call AOT-compiles with the
    latency-hiding scheduler; transparent on other backends and on any
    compile failure. The wrapped step must be called with a fixed signature
    (one shapes/dtypes/sharding combination), which training loops satisfy.
    """
    cache = {}

    def _sig(args):
        # The AOT-compiled executable is specialized to shapes, dtypes,
        # pytree structure AND input shardings — hash all four, otherwise a
        # same-shape call with a different treedef or sharding would hit an
        # executable that rejects it instead of triggering a recompile.
        # PyTreeDef / dtype / Sharding objects are hashable — no str()
        # rendering on the per-step dispatch path (a NamedSharding repr
        # renders the whole mesh, per leaf per call).
        leaves, treedef = jax.tree_util.tree_flatten(args)
        return (
            treedef,
            tuple(
                (
                    getattr(l, "shape", None),
                    getattr(l, "dtype", type(l)),
                    getattr(l, "sharding", None),
                )
                for l in leaves
            ),
        )

    def call(*args):
        if jax.default_backend() != "tpu":
            return jitted(*args)
        key = _sig(args)
        fn = cache.get(key)
        if fn is None:
            # staged fallback: a libtpu build that rejects the experimental
            # fusion flags must not also cost us the (older, widely
            # supported) latency-hiding scheduler
            for opts in (
                dict(_SCHED_OPTS),
                {"xla_tpu_enable_latency_hiding_scheduler": "true"},
            ):
                try:
                    fn = jitted.lower(*args).compile(compiler_options=opts)
                    break
                except Exception as e:  # pragma: no cover - backend-dependent
                    logging.warning(
                        "compile with options %s failed (%s)", opts, e
                    )
            else:
                logging.warning("falling back to plain jit")
                fn = jitted
            cache[key] = fn
        return fn(*args)

    return call
