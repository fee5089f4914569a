"""Export a tpuwsi checkpoint to a timm/DINO-named torch ``.pth``.

The reference ecosystem consumes torch state_dicts everywhere (its MIL
tooling loads backbones via ``create_model`` + ``load_state_dict``,
train.py:482-520; utils_MIL feature extraction the same). This CLI closes
the loop in the OTHER direction: a backbone trained on TPU with
``cli.train --ssl`` (or supervised) exports to a state_dict those torch
tools load directly:

  python -m tpuwsi.cli.export_torch --checkpoint runs/exp1/checkpoints \
      --arm teacher --output vit_small_dino.pth

Arms: ``teacher``/``student`` pick the DINO arm from an SSL checkpoint
(teacher is the convention for downstream use, as in DINO itself);
``params``/``ema`` pick the supervised weights. The backbone subtree is
located automatically (SSL checkpoints nest it under ``backbone``) and the
matching exporter chosen by family: ViT (timm/DINO names), resnet
(torchvision names, BN running stats from the TrainState), or
efficientnet (timm names).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tpuwsi checkpoint → torch state_dict")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint directory written by the training CLIs")
    p.add_argument("--step", default=None, type=int,
                   help="checkpoint step (default: best/latest per manager)")
    p.add_argument("--arm", default="auto",
                   choices=["auto", "teacher", "student", "params", "ema"],
                   help="which weights to export (auto: teacher if SSL, "
                        "else params)")
    p.add_argument("--output", required=True, help="output .pth path")
    return p


def _export_arm(tree, batch_stats):
    """Pick the matching exporter for the params tree (ViT / resnet /
    efficientnet) and return the torch-named state_dict."""
    from tpuwsi.models import convert

    if not isinstance(tree, dict):
        raise SystemExit("checkpoint arm is not a param tree")
    inner = tree.get("params", tree)
    if "backbone" in inner:  # DINOModel nesting (ssl_dino/dino.py)
        inner = inner["backbone"]
    if "patch_embed" in inner or "blocks_scan" in inner:
        return convert.flax_vit_to_torch({"params": inner})
    # CNN families need the BN running stats alongside the params
    if batch_stats is None:
        raise SystemExit(
            "CNN checkpoint arm without batch_stats — BN running stats "
            "are part of a torch checkpoint; export from a training "
            "checkpoint (the CLIs save them on the TrainState)"
        )
    variables = {"params": inner, "batch_stats": batch_stats}
    if "conv_stem" in inner:
        return convert.flax_efficientnet_to_torch(variables)
    if "conv1" in inner:
        return convert.flax_resnet_to_torch(variables)
    raise SystemExit(
        "unrecognized backbone in this checkpoint arm — the torch exporter "
        "covers ViT, the resnet family, and efficientnet_b0..b7"
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    from tpuwsi.train.checkpoint import load_checkpoint

    state = load_checkpoint(args.checkpoint, target=None, step=args.step)
    if state is None:
        raise SystemExit(f"no checkpoint found under {args.checkpoint}")

    arm = args.arm
    if arm == "auto":
        arm = "teacher" if "teacher_params" in state else "params"
    key = {
        "teacher": "teacher_params", "student": "student_params",
        "params": "params", "ema": "ema_params",
    }[arm]
    tree = state.get(key)
    if tree is None:
        raise SystemExit(
            f"checkpoint has no {key!r} (keys: {sorted(state)}) — "
            "pick --arm accordingly"
        )

    stats_key = "ema_batch_stats" if arm == "ema" else "batch_stats"
    sd = _export_arm(tree, state.get(stats_key) or state.get("batch_stats"))
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.output)
    step = state.get("step", args.step)
    print(f"exported {len(sd)} tensors ({arm}) from step "
          f"{int(step) if step is not None else '?'} -> {args.output}")
    return sd


if __name__ == "__main__":
    main(sys.argv[1:])
