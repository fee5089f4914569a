"""Vanilla folder-dataset training entry (timm_train.py parity).

The reference's second trainer (timm_train.py:357-1025) is an unmodified timm
script over pre-cut patch folders. Here it is the same orchestration as
tpuwsi.cli.train in folder mode, with timm's OWN defaults pinned where they
differ from the GipMed trainer's (timm_train.py argparse defaults):

  --eval-metric top1      (timm ranks checkpoints by top-1, not AUC)
  --val-split   0.2       (timm validates every epoch; our folder split)
  --eval_rate   1         (validate every epoch, timm_train.py:951)
  -b            128       (timm_train.py:163)
  --transform_type timm   (the real timm create_transform stack: RRC +
                           flips + ColorJitter + ImageNet normalize —
                           preprocess/timm_aug.py — instead of GipMed
                           recipes; --scale/--ratio/--hflip/--vflip/
                           --color-jitter/--crop-pct/--mean/--std wired)
  --sched       cosine, --epochs 300, --opt sgd (nesterov)  (same values)

Flags the user passes explicitly always win; the timm batch-augmentation
surface (--aa / --mixup / --cutmix / --reprob) is shared with the main
trainer (see preprocess/batch_aug.py).
"""

from __future__ import annotations

import sys

from tpuwsi.cli.train import main as _main

# argparse DESTS, applied through parse_args(default_overrides=...) so they
# rank BELOW --config YAML values and the command line (injecting them as
# argv would silently beat YAML config and abbreviated long options).
_TIMM_DEFAULTS = {
    "eval_metric": "top1",
    "val_split": 0.2,
    "eval_rate": 1,
    "batch_size": 128,
    "transform_type": "timm",
}


def compose_argv(argv):
    """timm_train.py positional data_dir compatibility only — the timm
    defaults travel through the parser's defaults layer, not argv."""
    argv = list(argv)
    if not any(a.startswith("--data-dir") for a in argv):
        if argv and not argv[0].startswith("-"):
            argv = ["--data-dir", argv[0]] + argv[1:]
    return argv


def main(argv=None):
    argv = compose_argv(argv if argv is not None else sys.argv[1:])
    return _main(argv, default_overrides=_TIMM_DEFAULTS)


if __name__ == "__main__":
    main()
