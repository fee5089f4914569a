#!/usr/bin/env python
"""Serving-path benchmark: slide-inference / feature-extraction throughput.

The training bench (bench.py) measures the SSL step; this measures the
OTHER production path — the reference's ``validate()`` / ``--extract_features``
loop (train.py:1146-1345): raw uint8 WSI tiles → on-device eval normalize →
ViT-S/16 forward → softmax probs (or 384-dim features).

Usage: python scripts/bench_infer.py [batch] [mode] [quant]
  mode: 'probs' (default, slide-eval path, num_classes=2)
        'features' (head=Identity extraction path, 384-dim)
  quant: 'int8' — post-training int8 body GEMMs (ops/quant.py; the CLI's
        --quantize int8 extraction path)

Prints one JSON line: "value" is the PIPELINED tiles/sec (what the serving
loops actually run — infer/pipeline.py dispatch-ahead fetch); the serialized
rate rides along as serialized_tiles_per_sec. Data-resident 256² tiles (the
reference serving config: tile_size 256 feeds the model at 256² through
interpolate_pos_encoding — no resize in the eval path).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "probs"
    quant = len(sys.argv) > 3 and sys.argv[3] == "int8"
    tile = 256  # raw WSI tile size (train.py:414 default)

    from tpuwsi.preprocess.recipes import make_recipe
    from tpuwsi.train.state import TrainState
    from tpuwsi.train.supervised import make_eval_step

    on_tpu = jax.default_backend() == "tpu"
    num_classes = 0 if mode == "features" else 2
    from tpuwsi.models.vit import VisionTransformer, vit_small

    model = VisionTransformer(
        vit_small(
            num_classes=num_classes,
            img_size=tile,
            use_pallas_attention=on_tpu,
            use_fused_mlp=False,
            ln_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            gelu_approx=True,
            quant_int8=quant,
        )
    )
    params = VisionTransformer(
        dataclasses.replace(model.config, quant_int8=False)
    ).init(jax.random.PRNGKey(0), jnp.zeros((1, tile, tile, 3), jnp.float32))
    if quant:
        from tpuwsi.ops.quant import quantize_vit_params

        params = quantize_vit_params(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=(),
        ema_params=None,
    )
    # Reference eval path: 256² tiles normalized and fed AT 256² (the CLI
    # builds the model at img_size = args.img_size or tile_size; 'none' has
    # no resize) — interpolate_pos_encoding handles the geometry.
    norm = make_recipe("none", train=False, tile_size=tile)
    step = jax.jit(
        make_eval_step(
            model.apply,
            preprocess_fn=lambda im: norm(jax.random.PRNGKey(0), im),
        )
    )

    imgs = np.random.randint(0, 255, (batch, tile, tile, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    logits, probs = step(state, b)
    np.asarray(probs)  # compile + force fetch (axon: block_until_ready lies)

    n_calls = 20
    t0 = time.perf_counter()
    for _ in range(n_calls):
        logits, probs = step(state, b)
        np.asarray(probs)
    dt = time.perf_counter() - t0

    # dispatch-ahead pipelined mode (infer/pipeline.py — what the serving
    # loops actually run): fetch lags 4 dispatches, hiding the per-call
    # dispatch+fetch latency behind device compute.
    from tpuwsi.infer.pipeline import pipelined_fetch

    def _dispatches():
        for i in range(n_calls):
            yield i, step(state, b)[1]

    t0 = time.perf_counter()
    for _ in pipelined_fetch(_dispatches(), depth=4):
        pass
    dt_pipe = time.perf_counter() - t0

    # scanned serving driver (--eval-steps-per-dispatch K): ONE device
    # dispatch runs K forwards via lax.scan — the serving-side analogue of
    # the training --steps-per-dispatch driver; amortizes the fixed
    # dispatch+fetch overhead and is robust to tunnel-latency jitter
    # (per-call rates here moved ±30% between runs, round-4 BENCH notes).
    from tpuwsi.train.supervised import make_multi_eval_step

    k_scan = int(os.environ.get("BENCH_INFER_K", "8"))
    multi = jax.jit(make_multi_eval_step(step))
    sb = {"images": jnp.asarray(np.broadcast_to(imgs, (k_scan,) + imgs.shape).copy())}
    np.asarray(multi(state, sb)[1])  # compile + fetch
    # floor of 3 scan calls: a single-dispatch window (large K) is all
    # noise and gives the pipelined variant nothing to overlap
    n_scans = max(3, (2 * n_calls) // k_scan)
    t0 = time.perf_counter()
    for _ in range(n_scans):
        np.asarray(multi(state, sb)[1])
    dt_scan = time.perf_counter() - t0
    scanned_rate = batch * k_scan * n_scans / dt_scan

    # scanned + pipelined — what the serving loops ACTUALLY run with
    # --eval-steps-per-dispatch > 1: eval_stream pushes scan dispatches
    # through pipelined_fetch, so scan i+1 is dispatched before scan i's
    # outputs are fetched. The serial scanned loop above pays the
    # dispatch+fetch latency once per K batches; this overlaps it too.
    def _scan_dispatches():
        for i in range(n_scans):
            yield i, multi(state, sb)[1]

    t0 = time.perf_counter()
    for _ in pipelined_fetch(_scan_dispatches(), depth=2):
        pass
    dt_scan_pipe = time.perf_counter() - t0
    scanned_pipelined_rate = batch * k_scan * n_scans / dt_scan_pipe

    tiles_per_sec = batch * n_calls / dt
    print(
        json.dumps(
            {
                # "value" stays the PIPELINED rate for longitudinal
                # comparability with the BENCH.md history (advisor round-4:
                # max(pipelined, scanned) silently changed the metric's
                # meaning); the scanned K-dispatch rate rides along
                # explicitly as scanned_tiles_per_sec.
                "metric": "inference_tiles_per_sec_per_chip_vit_s16_"
                + mode + ("_int8" if quant else ""),
                "value": round(batch * n_calls / dt_pipe, 1),
                "unit": f"{tile}^2 tiles/sec/chip (eval normalize + forward, "
                        "pipelined dispatch-ahead)",
                "scanned_tiles_per_sec": round(scanned_rate, 1),
                "scanned_pipelined_tiles_per_sec": round(
                    scanned_pipelined_rate, 1),
                "scan_k": k_scan,
                "batch_size": batch,
                "ms_per_batch_serialized": round(1e3 * dt / n_calls, 2),
                "ms_per_batch_pipelined": round(1e3 * dt_pipe / n_calls, 2),
                "serialized_tiles_per_sec": round(tiles_per_sec, 1),
                "out_dim": int(logits.shape[-1]),
                "raw_tile": tile,
            }
        )
    )


if __name__ == "__main__":
    main()
