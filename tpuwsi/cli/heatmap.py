"""Full-slide heatmap inference CLI.

Parity surface: ``Batched_Full_Slide_Inference_Dataset``
(datasets.py:2135-2351) — the reference ships the dataset but no driver; this
entry walks every tile of each listed slide (tissue + sampled background),
scores them with a trained classifier, and writes the per-slide class-1
probability heatmap on the equivalent grid (datasets.py:2077-2083):

  python -m tpuwsi.cli.heatmap --slides-file Infer_Slides.txt \\
      --slide-mag 40 --checkpoint runs/Exp_1/checkpoints --output heatmaps/

Outputs per slide: ``<name>.heatmap.npy`` (float32, NaN = not scored) and a
grayscale ``<name>.heatmap.png`` render, plus a summary line with the
mean-softmax slide score (train.py:1288 aggregation).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tpuwsi full-slide heatmap inference")
    p.add_argument("--slides-file", default=None,
                   help="Infer_Slides.txt: one slide filename per line "
                        "(datasets.py:2143-2150); paths relative to its dir")
    p.add_argument("--slide", action="append", default=[],
                   help="slide path (repeatable; alternative to --slides-file)")
    p.add_argument("--slide-mag", default=10.0, type=float,
                   help="slide objective magnification (the slides_data "
                        "'Manipulated Objective Power' column)")
    p.add_argument("--desired-mag", default=10, type=int)
    p.add_argument("--tile-size", default=256, type=int)
    p.add_argument("--img-size", default=None, type=int,
                   help="model input size (default: tile size)")
    p.add_argument("--model", default="vit_small_patch16_224")
    p.add_argument("--num-classes", default=2, type=int)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoints dir from a training run (omit for a "
                        "random-init smoke run)")
    p.add_argument("--grid-dir", default=None,
                   help="Grids_<mag> dir with tissue-grid pickles; tiles on "
                        "the grid are flagged tissue")
    p.add_argument("--background-fraction", default=0.2, type=float,
                   help="fraction of off-grid background tiles scored "
                        "(datasets.py:2222-2230)")
    p.add_argument("-tpi", "--tiles-per-iter", dest="tiles_per_iter",
                   default=100, type=int)
    p.add_argument("--dispatch-ahead", default=2, type=int)
    p.add_argument("--eval-steps-per-dispatch", default=8, type=int,
                   help="stack N chunks per lax.scan'd device dispatch "
                        "(amortizes dispatch+fetch; 1 = per-chunk). "
                        "Default 8 per the round-5 serving measurements")
    p.add_argument("--output", default="heatmaps")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8 body GEMMs for the scoring forward "
                        "(ops/quant.py; ViT family)")
    return p


def _heatmap_png(heat: np.ndarray, path: str):
    """Grayscale render: score 0→black, 1→white, unscored → black."""
    from PIL import Image

    img = np.nan_to_num(heat, nan=0.0)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from tpuwsi.infer.full_slide import (
        FullSlideWalker,
        assemble_heatmap,
        read_infer_slides_file,
    )
    from tpuwsi.infer.pipeline import pipelined_fetch
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess import make_recipe
    from tpuwsi.train.checkpoint import load_checkpoint
    from tpuwsi.train.state import TrainState

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    slides = list(args.slide)
    if args.slides_file:
        base = os.path.dirname(os.path.abspath(args.slides_file))
        slides += [
            os.path.join(base, s) for s in read_infer_slides_file(args.slides_file)
        ]
    if not slides:
        raise SystemExit("no slides: pass --slides-file or --slide")

    img_size = args.img_size or args.tile_size
    quantize = args.quantize == "int8"
    model = create_model(
        args.model, num_classes=args.num_classes, img_size=img_size,
        use_pallas_attention=jax.default_backend() == "tpu",
        quant_int8=quantize,
    )
    # params always init/restore as f32 (checkpoints are f32); the int8
    # view quantizes them once below
    init_model = create_model(
        args.model, num_classes=args.num_classes, img_size=img_size,
        use_pallas_attention=jax.default_backend() == "tpu",
    ) if quantize else model
    params = init_model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
    )
    if args.checkpoint:
        # Training checkpoints save the FULL TrainState (params + opt_state
        # [+ ema]); an eval-only target with opt_state=() would be a
        # structure mismatch under StandardRestore — restore the raw tree
        # and take the weights (EMA copy when present, matching the
        # reference's EMA eval, train.py:947-956).
        raw = load_checkpoint(args.checkpoint)
        if raw is None:
            raise SystemExit(f"no checkpoint restorable from {args.checkpoint}")
        ema = raw.get("ema_params") if isinstance(raw, dict) else None
        params = (
            ema if ema is not None
            else raw["params"] if isinstance(raw, dict) else raw.params
        )
        logging.info(
            "restored %s (step %s%s)", args.checkpoint,
            raw.get("step") if isinstance(raw, dict) else raw.step,
            ", EMA weights" if ema is not None else "",
        )
    else:
        logging.warning("no --checkpoint: scoring with RANDOM-INIT weights")
    if quantize:
        from tpuwsi.ops.quant import quantize_vit_params

        params = quantize_vit_params(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=(),
        ema_params=None,
    )

    norm = make_recipe("none", train=False, tile_size=img_size)

    @jax.jit
    def score(params, images):
        x = norm(jax.random.PRNGKey(0), images)
        if x.shape[1] != img_size:
            # --img-size: the walker reads tile_size tiles — resample to the
            # model input size like the training transform does, instead of
            # silently running the ViT at tile resolution through
            # interpolate_pos_encoding
            from tpuwsi.preprocess.augment import resize_bilinear

            x = jax.vmap(lambda im: resize_bilinear(im, img_size))(x)
        logits = model.apply(params, x, deterministic=True)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]

    os.makedirs(args.output, exist_ok=True)
    results = {}
    # scanned serving driver (shared with cli.train --eval-steps-per-dispatch):
    # one lax.scan'd dispatch per k chunks; built once, reused across slides
    k_ev = getattr(args, "eval_steps_per_dispatch", 1)
    scanned = None
    if k_ev > 1:
        from tpuwsi.train.supervised import make_multi_eval_step

        scanned = jax.jit(make_multi_eval_step(score))
    for slide_path in slides:
        walker = FullSlideWalker(
            slide_path,
            magnification=args.slide_mag,
            tile_size=args.tile_size,
            desired_magnification=args.desired_mag,
            tiles_per_iter=args.tiles_per_iter,
            grid_dir=args.grid_dir,
            background_sample_fraction=args.background_fraction,
            rng=np.random.default_rng(args.seed),
        )

        from tpuwsi.infer.pipeline import eval_stream

        stream = eval_stream(
            walker.walk(), lambda c: c.images,
            lambda im: score(state.params, jnp.asarray(im)),
            multi_call=(
                (lambda ims: scanned(state.params, jnp.asarray(ims)))
                if scanned is not None else None),
            k=k_ev, depth=args.dispatch_ahead,
        )
        locs, scores, tissue_scores = [], [], []
        shape = walker.equivalent_grid_shape
        with walker:  # release the slide handle per entry (fd hygiene)
            for chunk, s in stream:
                s = np.asarray(s)[chunk.mask]
                locs.append(chunk.equivalent_locations[chunk.mask])
                scores.append(s)
                tissue_scores.extend(s[chunk.is_tissue[chunk.mask]].tolist())
        locs = np.concatenate(locs) if locs else np.zeros((0, 2), int)
        scores = np.concatenate(scores) if scores else np.zeros((0,))
        heat = assemble_heatmap(shape, locs, scores)
        name = os.path.splitext(os.path.basename(slide_path))[0]
        npy = os.path.join(args.output, f"{name}.heatmap.npy")
        np.save(npy, heat)
        _heatmap_png(heat, os.path.join(args.output, f"{name}.heatmap.png"))
        slide_score = float(np.mean(tissue_scores)) if tissue_scores else float(
            np.mean(scores)
        ) if len(scores) else float("nan")
        results[name] = slide_score
        logging.info(
            "%s: %d tiles scored on a %s grid, slide score %.4f → %s",
            name, len(scores), shape, slide_score, npy,
        )
    return results


if __name__ == "__main__":
    main()
