#!/usr/bin/env python
"""On-chip MIL-head training/eval rate: steps-per-dispatch A/B.

The MIL head (gated attention over frozen 512-dim feature bags,
utils_MIL-parity workload) is dispatch-bound: its GEMMs are microseconds
of device work, so epoch time is ~n_batches × per-dispatch overhead. This
measures real epochs of `train_mil_head` (the tpuwsi-mil CLI's loop) at
steps_per_dispatch 1 vs the adopted 8, on a CAT-like synthetic workload.

Usage: python scripts/bench_mil.py [n_slides=256] [bag=100] [epochs=20]
"""

from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from tpuwsi.core.compile import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")


class _SyntheticBags:
    """Minimal dataset exposing the .bags() contract of FeaturesMILDataset
    (fixed-shape padded batches) over in-memory features."""

    def __init__(self, n, tiles, dim, bag, seed=0):
        rng = np.random.default_rng(seed)
        self.feats = rng.normal(0, 1, (n, tiles, dim)).astype(np.float32)
        self.labels = (np.arange(n) % 2).astype(np.int64)
        self.feats[self.labels == 1, :, :4] += 1.5
        self.bag = bag

    def __len__(self):
        return len(self.labels)

    def bags(self, rng, batch_size, shuffle=True, drop_last=False):
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        for s in range(0, len(order), batch_size):
            chunk = order[s:s + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            f = np.stack([
                self.feats[i][np.random.default_rng(i).choice(
                    self.feats.shape[1], self.bag,
                    replace=self.feats.shape[1] < self.bag)]
                for i in chunk
            ])
            yield {"features": f,
                   "mask": np.ones((len(chunk), self.bag), bool),
                   "labels": self.labels[chunk]}


def run(ds, eval_ds, spd, epochs, batch=16):
    from tpuwsi.mil.train import train_mil_head

    t0 = time.perf_counter()
    metrics = {}
    model, state = train_mil_head(
        ds, epochs=epochs, batch_size=batch, eval_dataset=eval_ds,
        steps_per_dispatch=spd,
        log_fn=lambda e, m: metrics.update(m),
    )
    dt = time.perf_counter() - t0
    n_batches = -(-len(ds) // batch) * epochs
    print(f"spd={spd:2d}: {dt:6.2f}s total, {dt / epochs * 1e3:7.1f} ms/epoch "
          f"({n_batches / dt:6.1f} train-batches/s)  "
          f"eval_auc={metrics.get('eval_auc', float('nan')):.3f}",
          flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bag = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    ds = _SyntheticBags(n, 200, 512, bag, seed=0)
    eval_ds = _SyntheticBags(64, 200, 512, bag, seed=1)
    # warm compile both variants with one epoch each
    run(ds, eval_ds, 1, 1)
    run(ds, eval_ds, 8, 1)
    dt1 = run(ds, eval_ds, 1, epochs)
    dt8 = run(ds, eval_ds, 8, epochs)
    print(f"speedup spd8/spd1: {dt1 / dt8:.2f}x")


if __name__ == "__main__":
    main()
