"""Vanilla folder-dataset training entry (timm_train.py parity).

The reference's second trainer (timm_train.py:357-1025) is an unmodified timm
script over pre-cut patch folders. Here it is the same orchestration as
tpuwsi.cli.train in folder mode — this wrapper pins folder mode and the
timm-style defaults.
"""

from __future__ import annotations

import sys

from tpuwsi.cli.train import main as _main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if not any(a.startswith("--data-dir") for a in argv):
        # timm_train.py positional data_dir compatibility
        if argv and not argv[0].startswith("-"):
            argv = ["--data-dir", argv[0]] + argv[1:]
    return _main(argv)


if __name__ == "__main__":
    main()
