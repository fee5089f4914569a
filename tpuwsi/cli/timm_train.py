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

_TIMM_DEFAULTS = {
    "--eval-metric": "top1",
    "--val-split": "0.2",
    "--eval_rate": "1",
    "-b": "128",
    "--transform_type": "timm",
}


def compose_argv(argv):
    """Final argv: user args + timm defaults for flags the user did not set."""
    argv = list(argv)
    if not any(a.startswith("--data-dir") for a in argv):
        # timm_train.py positional data_dir compatibility
        if argv and not argv[0].startswith("-"):
            argv = ["--data-dir", argv[0]] + argv[1:]
    given = {a.split("=")[0] for a in argv}
    # glued short options ('-b64') must also count as given, or the
    # appended default would silently win (argparse keeps the LAST value)
    short_given = {
        a[:2] for a in argv
        if len(a) > 2 and a[0] == "-" and a[1] != "-" and a[2] != "="
    }
    extra = []
    for flag, value in _TIMM_DEFAULTS.items():
        alias = {"-b": "--batch-size"}.get(flag, flag)
        if flag not in given and alias not in given and flag not in short_given:
            extra += [flag, value]
    return argv + extra


def main(argv=None):
    return _main(compose_argv(argv if argv is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
