"""MIL-over-features training CLI.

The reference exposes the MIL workflow only as dataset classes + offline
helpers (`Features_MILdataset` datasets.py:820-1553, the `utils_MIL` locator
dicts, and `save_all_slides_and_models_data` utils_MIL.py:1502-1600) — the
actual trainer lived in a sibling repo. This entry makes the whole chain
reachable from one command:

  python -m tpuwsi.cli.mil_train --features runs/Exp_1/features \\
      --test-features runs/Exp_1/features_test --bag-size 100 --epochs 30 \\
      --output runs/mil --export-xlsx

or through the feature registry (utils_MIL parity, $TPUWSI_FEATURE_REGISTRY):

  python -m tpuwsi.cli.mil_train --dataset CAT -tar ER -tf 1 [--paired-is-tumor]

Trains the gated-attention MIL head (models/mil.GatedAttentionMIL) over the
reference-format 6/7/8-tuple feature pickles, evaluates slide-level AUC per
epoch, checkpoints the head, and optionally exports the per-slide tile
scores + attention weights (before/after softmax) xlsx exactly like
``save_all_slides_and_models_data``.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tpuwsi MIL head trainer")
    src = p.add_argument_group("feature source")
    src.add_argument("--features", default=None,
                     help="train feature dir / .data file (skips the registry)")
    src.add_argument("--test-features", default=None,
                     help="held-out feature dir / .data file")
    src.add_argument("--dataset", default="CAT",
                     help="registry dataset name (with --features unset)")
    src.add_argument("-tar", "--target", dest="target", default="ER")
    src.add_argument("-tf", "--test_fold", dest="test_fold", default=1, type=int)
    src.add_argument("--paired-is-tumor", action="store_true",
                     help="load the registered Receptor+is_Tumor paired set "
                          "(512+512 per-tile concat, datasets.py:876-882)")
    bag = p.add_argument_group("bags")
    bag.add_argument("--bag-size", default=100, type=int)
    bag.add_argument("--per-patient", action="store_true",
                     help="group bags per patient (datasets.py:1117-1148)")
    bag.add_argument("--fixed-tile-num", default=None, type=int)
    bag.add_argument("--minimum-tiles", default=50, type=int,
                     help="drop slides with fewer tiles (reference default)")
    tr = p.add_argument_group("training")
    tr.add_argument("--epochs", default=30, type=int)
    tr.add_argument("-b", "--batch-size", dest="batch_size", default=16,
                    type=int)
    tr.add_argument("--lr", default=1e-3, type=float)
    tr.add_argument("--hidden-dim", default=128, type=int)
    tr.add_argument("--seed", default=0, type=int)
    tr.add_argument("--steps-per-dispatch", default=8, type=int,
                    help="scan N optimizer steps per device dispatch (the "
                         "MIL head is dispatch-bound: its GEMMs are "
                         "microseconds of device work). Default 8 per the "
                         "round-5 serving measurements")
    out = p.add_argument_group("output")
    out.add_argument("--output", default="runs/mil")
    out.add_argument("--export-xlsx", action="store_true",
                     help="per-slide tile scores + attention weights "
                          "(save_all_slides_and_models_data parity)")
    return p


def _resolve_locations(args):
    if args.features:
        train_loc = args.features
        test_loc = args.test_features
    else:
        from tpuwsi.mil.locator import FeatureLocator

        loc = FeatureLocator()
        if args.paired_is_tumor:
            train_loc = loc.paired_locations(
                args.dataset, args.target, args.test_fold, is_train=True
            )
            test_loc = loc.paired_locations(
                args.dataset, args.target, args.test_fold, is_train=False
            )
        else:
            train_loc, _, _, _ = loc.dataset_properties_to_location(
                args.dataset, args.target, args.test_fold, is_train=True
            )
            test_loc, _, _, _ = loc.dataset_properties_to_location(
                args.dataset, args.target, args.test_fold, is_train=False
            )
    return train_loc, test_loc


def export_scores(model, state, dataset, out_path: str):
    """Per-slide export over ALL tiles of each bag entry: slide score from
    the pooled head, per-tile scores via the (w1-w0)ᵀf readout on the
    classifier kernel (utils_MIL.py:1603-1630; paired 1024-dim features
    slice back to the receptor half), attention before/after softmax."""
    import jax
    import jax.numpy as jnp

    from tpuwsi.mil.train import export_slide_scores_xlsx

    kernel = state.params["params"]["classifier"]["kernel"]
    receptor_slice = None
    if getattr(dataset, "paired_is_tumor", False):
        receptor_slice = int(kernel.shape[0]) // 2

    fwd = jax.jit(
        lambda p, f, m: model.apply(p, f, m, return_attention=True)
    )
    kernel_np = np.asarray(kernel)
    names, slide_scores, targets = [], [], []
    tile_scores_list, before_list, after_list = [], [], []
    for i in range(len(dataset)):
        feats, target, _, name = dataset._entry(i)
        n = feats.shape[0]
        # pad each bag to the next power-of-two bucket: per-slide tile counts
        # are essentially unique, so jitting on the raw length would compile
        # once PER SLIDE — bucketing + the validity mask gives a handful of
        # compiles for a whole cohort
        bucket = max(16, 1 << (n - 1).bit_length())
        f = np.zeros((1, bucket, feats.shape[1]), np.float32)
        f[0, :n] = feats
        mask = np.zeros((1, bucket), bool)
        mask[0, :n] = True
        logits, before, after = fwd(
            state.params, jnp.asarray(f), jnp.asarray(mask)
        )
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        names.append(name)
        slide_scores.append(float(probs[1]))
        targets.append(int(target))
        # (w1-w0)'f readout in plain numpy — no per-length compiles
        diff = kernel_np[:, 1] - kernel_np[:, 0]
        if receptor_slice is not None:
            tscores = feats[:, :receptor_slice] @ diff[:receptor_slice]
        else:
            tscores = feats @ diff
        tile_scores_list.append(tscores.tolist())
        before_list.append(np.asarray(before)[0, :n].tolist())
        after_list.append(np.asarray(after)[0, :n].tolist())
    export_slide_scores_xlsx(
        out_path, names, slide_scores, targets, tile_scores_list,
        before_list, after_list,
    )
    return out_path


def main(argv=None):
    from tpuwsi.mil.features import FeaturesMILDataset
    from tpuwsi.mil.train import evaluate_mil, train_mil_head
    from tpuwsi.train.checkpoint import CheckpointManager

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    train_loc, test_loc = _resolve_locations(args)

    def make_ds(loc, is_train):
        return FeaturesMILDataset(
            loc,
            bag_size=args.bag_size,
            target=args.target.split("+")[0],
            is_train=is_train,
            is_per_patient=args.per_patient,
            fixed_tile_num=args.fixed_tile_num,
            minimum_tiles_in_slide=args.minimum_tiles,
        )

    train_ds = make_ds(train_loc, True)
    eval_ds = make_ds(test_loc, False) if test_loc else None
    logging.info(
        "MIL: %d train bags%s, bag_size=%d%s", len(train_ds),
        f", {len(eval_ds)} eval bags" if eval_ds else "", args.bag_size,
        " (paired Receptor+is_Tumor)" if getattr(
            train_ds, "paired_is_tumor", False) else "",
    )

    model, state = train_mil_head(
        train_ds,
        hidden_dim=args.hidden_dim,
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        seed=args.seed,
        eval_dataset=eval_ds,
        steps_per_dispatch=args.steps_per_dispatch,
        log_fn=lambda e, m: logging.info(
            "epoch %d %s", e,
            " ".join(f"{k}={v:.4f}" for k, v in m.items()),
        ),
    )

    os.makedirs(args.output, exist_ok=True)
    ckpt = CheckpointManager(
        os.path.join(args.output, "checkpoints"), metric_name="eval_auc"
    )
    final = (
        evaluate_mil(model, state, eval_ds, args.batch_size, args.seed,
                     steps_per_dispatch=args.steps_per_dispatch)
        if eval_ds is not None else {}
    )
    ckpt.save(int(state.step), state, final or {"eval_auc": 0.0})
    ckpt.close()
    if final:
        logging.info("final eval: %s", final)
    if args.export_xlsx:
        path = export_scores(
            model, state, eval_ds if eval_ds is not None else train_ds,
            os.path.join(args.output, "slide_scores.xlsx"),
        )
        logging.info("slide scores → %s", path)
    return model, state, final


if __name__ == "__main__":
    main()
