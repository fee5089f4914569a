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


def initialize_multihost() -> tuple[int, int]:
    """Initialize jax.distributed when running under a multi-host launcher.

    Returns (process_index, process_count). Single-host (or already
    initialized) is a no-op. Host coordination env vars follow the standard
    JAX conventions (COORDINATOR_ADDRESS etc. are auto-detected on TPU VMs).
    """
    if jax.process_count() > 1:
        return jax.process_index(), jax.process_count()
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except RuntimeError as e:  # already initialized
            logging.info("jax.distributed.initialize: %s", e)
    return jax.process_index(), jax.process_count()


def host_seed_offset(seed: int) -> int:
    """Per-rank seed offset parity (train.py:467) — explicit, not global."""
    return seed + jax.process_index()
