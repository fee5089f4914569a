"""Multi-host initialization and process-level helpers.

Parity: the reference's ``init_distributed_device`` + torchrun launch
(train.py:431, sbatch-ssl.sh:55). On TPU pods there is one process per host;
``jax.distributed.initialize()`` wires them up and GSPMD handles the rest —
no explicit process-group plumbing, no NCCL.
"""

from __future__ import annotations

import logging
import os

import jax


_initialized = False


def initialize_multihost() -> tuple[int, int]:
    """Initialize jax.distributed when running under a multi-host launcher.

    Returns (process_index, process_count). Single-host is a no-op.

    ORDER MATTERS: ``jax.distributed.initialize()`` must run BEFORE any
    other jax call touches the backend — ``jax.process_count()`` itself
    initializes a single-process backend, after which distributed init
    raises and every host would silently proceed as process 0 of 1
    (duplicated data shards, identical seeds). So the env-var check comes
    first and the jax.* queries only after.
    """
    global _initialized
    if not _initialized and (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    ):
        # Generic launcher support (torchrun's RANK/WORLD_SIZE equivalent):
        # on TPU pods / SLURM / MPI jax auto-detects everything, but jax has
        # no env plugin for a plain "N processes on arbitrary hosts" launch —
        # JAX_NUM_PROCESSES + JAX_PROCESS_ID fill that hole (and the real
        # 2-process integration test drives this path, tests/test_dist2proc.py).
        kwargs = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            if "JAX_PROCESS_ID" not in os.environ:
                raise RuntimeError(
                    "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not — "
                    "the generic launch contract needs both on every host "
                    "(plus JAX_COORDINATOR_ADDRESS)."
                )
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            # genuinely already initialized (e.g. by an outer launcher) —
            # fine; anything else deserves the log line before we query
            logging.info("jax.distributed.initialize: %s", e)
    _initialized = True
    return jax.process_index(), jax.process_count()


def host_seed_offset(seed: int) -> int:
    """Per-rank seed offset parity (train.py:467) — explicit, not global."""
    return seed + jax.process_index()
