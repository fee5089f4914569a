#!/usr/bin/env python
"""Headline benchmark: augmented tiles/sec/chip through the fused multi-crop
preprocessing + ViT-S/16 DINO SSL step (BASELINE.json north star: ≥10,000 on
a v4-8 chip; baseline ratio reported against that target).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax

from tpuwsi.core.compile import machine_cache_dir

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

NORTH_STAR = 10_000.0  # tiles/sec/chip (BASELINE.json)

# NOTE: buffer donation (donate_argnums) triggers INVALID_ARGUMENT on the
# axon TPU backend in this image — steps run undonated.


def bench_args():
    """The run-book SSL recipe (scripts/train-ssl.sh) minus data plumbing —
    the argv whose step this bench measures."""
    from tpuwsi.cli.args import parse_args

    return parse_args([
        "--ssl", "--model", "vit_small_patch16_224_dino",
        "--epochs", "300", "--warmup-epochs", "10",
        "--opt", "adamw", "--lr-base", "0.0005", "--weight-decay", "0.04",
    ])


def bench_vit_config(on_tpu: bool):
    """The exact ViTConfig this bench measures (tests pin the CLI to it)."""
    from tpuwsi.cli.train import ssl_backbone_config

    return ssl_backbone_config(bench_args(), on_tpu)


def bench_multicrop_config(on_tpu: bool):
    """The exact MultiCropConfig this bench measures."""
    from tpuwsi.cli.train import ssl_multicrop_config

    return ssl_multicrop_config(bench_args(), on_tpu)


def build_bundle(batch_size: int, vit_overrides: dict | None = None):
    """The bench step IS the CLI's production SSL step: both surfaces
    assemble through ``tpuwsi.cli.train.ssl_step_bundle`` (round-3 VERDICT
    item 1), so the recorded number includes everything the CLI trains
    with — global-norm grad clipping (3.0), drop-path 0.1, the
    warmup-cosine schedule — not a stripped-down lookalike. The physical
    CLI-loop rate check is upload-bound on the tunneled bench host
    (40 MB/s link vs 184 MB/s consumed — BENCH.md "Pre-decoded ring
    overlap"), so step-program identity is pinned structurally instead."""
    from tpuwsi.cli.train import ssl_step_bundle

    return ssl_step_bundle(bench_args(), steps_per_epoch=1000,
                           global_batch=batch_size,
                           vit_overrides=vit_overrides)


def build(batch_size: int, tile: int = 224, raw: bool = False,
          vit_overrides: dict | None = None):
    """Build the bench step. ``vit_overrides`` patches the ViTConfig — the
    shared entry the exp_* A/B scripts use so they always measure deltas
    against the EXACT adopted configuration (round-4 review: two scripts
    hand-copied this builder and would silently drift)."""
    b = build_bundle(batch_size, vit_overrides)
    return b.state, (b.raw_step if raw else jax.jit(b.raw_step))


def main():
    # With bf16 augmentation + coordinate-folded hflip, b96 edges b128
    # again (7,157 vs 7,076 views/s — scripts/exp_batch3.py; b160 6,793
    # regresses from HBM pressure).
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    tile = 256  # raw WSI tile size fed to multi-crop (train.py:414: 256 default)
    state, raw_step = build(batch_size, raw=True)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch_size, tile, tile, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}

    # On-device multi-step driver: K train steps per dispatch via lax.scan
    # (per-step folded rng; state carried on device). The per-call loop
    # leaves ~7 ms/step of tunnel dispatch latency on the floor (152.5 vs
    # 144.5 ms/step measured, scripts/exp_scan_steps.py) — a production TPU
    # training loop runs its input-fed equivalent via host offload +
    # dispatch-ahead; the resident-data bench measures the compute path.
    # K sweep (scripts/exp_flags3.py, b96): K=8 109.0 ms, K=32 102.9,
    # K=64 102.0; re-measured under the final flags (round-3 session 3):
    # K=64 7,543 vs K=32 7,489 views/s (+0.7%) with b112 7,195 / b128 7,338
    # both losing to b96. Round-4 re-sweep under the savep config:
    # b96/K=128 7,860 vs b96/K=64 7,833, b112 7,515, b128 7,455 —
    # K=128 @ b96 adopted. Override: bench.py [batch] [K].
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    def multi(state, batch, rng):
        def body(carry, i):
            st, m = raw_step(carry, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    step = jax.jit(multi)
    # Latency-hiding scheduler + reduce/broadcast- and conv-output-fusion
    # off: the per-fusion MFU table (scripts/exp_mfu3.py) showed the GEMM
    # slack concentrated in epilogue-fused backward combos; disabling those
    # fusions measured +2.4% at K=8 and ~+0.3% at K=32 (scripts/
    # exp_flags3b.py) — never worse. Conv INPUT fusion stays ON (-31% off).
    if jax.default_backend() == "tpu":
        step = step.lower(state, batch, rng).compile(
            compiler_options={
                "xla_tpu_enable_latency_hiding_scheduler": "true",
                "xla_tpu_rwb_fusion": "false",
                "xla_jf_conv_output_fusion": "false",
            }
        )

    # warmup/compile — np.asarray forces a real device round-trip (plain
    # block_until_ready does not surface execution on the axon backend).
    state, losses = step(state, batch, rng)
    np.asarray(losses)

    # ≥3 INDEPENDENT timing windows (round-4 VERDICT item 3): the driver's
    # snapshot and the builder's runs differed ~2% on the same program —
    # run-to-run tunnel spread the old single-window timing hid. Each
    # window is one K-step scan call (~13 s at the adopted b96/K=128);
    # headline "value" is the MEDIAN window rate, min/max ride along.
    n_windows = 4
    window_rates = []
    for i in range(n_windows):
        t0 = time.perf_counter()
        state, losses = step(state, batch, jax.random.fold_in(rng, 1000 + i))
        np.asarray(losses)
        window_rates.append(batch_size * K / (time.perf_counter() - t0))

    tiles_per_sec = float(np.median(window_rates))
    tiles_min, tiles_max = float(min(window_rates)), float(max(window_rates))
    # Each source tile yields 8 augmented crops (2×224² global + 6×96² local)
    # that all flow through the student — "augmented tiles" per the BASELINE
    # north star are the multi-crop outputs.
    views_per_sec = tiles_per_sec * 8
    # The 10k north star is a TPU v4 number (275 TF/s bf16, 1228 GB/s); the
    # chip behind this tunnel measures 201 TF/s on the pure ViT GEMM chain
    # and ~1.06 TB/s elementwise (v5e-class). Region-scaled projection
    # (GEMM+attention by 275/201, elementwise by HBM ratio — full derivation
    # in BENCH.md "Hardware normalization"): measured step × 0.76. Stated
    # as a RANGE over the measured window spread (round-4 VERDICT item 3),
    # not a point estimate.
    print(
        json.dumps(
            {
                "metric": "augmented_tiles_per_sec_per_chip_vit_s16_dino_ssl_step",
                "value": round(views_per_sec, 2),
                "unit": "augmented tiles (multi-crop views)/sec/chip "
                        "(median of %d windows)" % n_windows,
                "vs_baseline": round(views_per_sec / NORTH_STAR, 4),
                "views_per_sec_min": round(tiles_min * 8, 2),
                "views_per_sec_max": round(tiles_max * 8, 2),
                "n_windows": n_windows,
                "source_tiles_per_sec": round(tiles_per_sec, 2),
                "batch_size": batch_size,
                "v4_projected_views_per_sec_range": [
                    round(tiles_min * 8 / 0.76, 0),
                    round(tiles_max * 8 / 0.76, 0),
                ],
                "v4_projection_note": "region-scaled to the v4 spec the "
                "north star assumes (this chip: 201/275 TF/s) — BENCH.md",
            }
        )
    )


if __name__ == "__main__":
    main()
