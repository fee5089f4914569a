"""Gradient-flow diagnostics.

Parity: utils.py:797-826 ``plot_grad_flow`` — the reference plots per-layer
average gradient magnitudes with matplotlib. TPU-native version computes the
per-layer |grad| means/maxes ON DEVICE inside the step (no host sync) and
returns a dict for logging; an optional text renderer replaces the plot.
"""

from __future__ import annotations

import math

from typing import Dict

import jax
import jax.numpy as jnp


def grad_flow_summary(grads) -> Dict[str, jax.Array]:
    """{layer path: (mean |g|, max |g|)} for all float leaves."""
    out = {}

    def visit(path, leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            out[name] = (jnp.mean(jnp.abs(leaf)), jnp.max(jnp.abs(leaf)))
        return leaf

    jax.tree_util.tree_map_with_path(visit, grads)
    return out


def render_grad_flow(summary: Dict[str, tuple], width: int = 40) -> str:
    """ASCII bar chart of per-layer mean |grad| (plot_grad_flow stand-in)."""
    if not summary:
        return "(no gradients)"
    means = {k: float(v[0]) for k, v in summary.items()}
    finite = [v for v in means.values() if math.isfinite(v)]
    top = max(finite) if finite else 1.0
    top = top or 1.0
    lines = []
    for k in sorted(means):
        v = means[k]
        if math.isfinite(v):
            bar = "#" * max(int(v / top * width), 0)
        else:
            # NaN/inf gradients are exactly what this diagnostic exists to
            # show — render a marker instead of crashing on int(NaN)
            bar = "!" * width
        lines.append(f"{k:<60s} {v:.3e} {bar}")
    return "\n".join(lines)
