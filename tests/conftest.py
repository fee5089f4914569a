"""Test config: force an 8-virtual-device CPU mesh so DP/TP semantics are
testable without TPU hardware (SURVEY §4).

Note: the env var JAX_PLATFORMS is overridden by the TPU PJRT plugin in this
image, so we force CPU via jax.config (which wins) before any device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # Belt-and-braces alongside the NPROC fix below: XLA:CPU aborts the
    # whole interpreter ("Fatal Python error: Aborted", rendezvous.cc
    # termination timeout, default 40s) when the 8 virtual devices' threads
    # reach a collective too far apart — on a slow host, heavy-step compute
    # serialized across device threads can legitimately exceed 40s.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags
if os.cpu_count() and os.cpu_count() < 16:
    # XLA:CPU backs all 8 virtual devices with ONE thread pool sized from
    # the host CPU count. Its thunk executor runs INDEPENDENT collectives
    # in whatever order per device, and a rendezvous wait parks a pool
    # thread — with few cores the pool can have every thread parked in
    # collective A on some devices while other devices sit queued behind it
    # holding collective B: a deadlock, aborted by the rendezvous timeout
    # ("Expected 8 threads ... only 6 arrived", with participants split
    # across two op_ids). Observed deterministically on a 1-core CI host
    # (test_cli_augmix_jsd_aug_splits, round 4). Pretend ≥16 CPUs so pools
    # hold enough threads to float every device past any collective pair;
    # real parallelism is still bounded by the physical cores.
    os.environ.setdefault("NPROC", "16")
    os.environ.setdefault("PJRT_NPROC", "16")
# Synchronous orbax saves in tests: async checkpointing's background threads
# outliving a test were the other teardown-crash suspect (see
# train/checkpoint.py).
os.environ.setdefault("TPUWSI_SYNC_CKPT", "1")

import jax  # noqa: E402

if not os.environ.get("TPUWSI_TPU_TESTS"):
    # TPUWSI_TPU_TESTS=1 keeps the real backend for the hardware-only
    # kernel-path checks (test_tpu_kernel_paths.py)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Build the native tile-ingest library on first run (fresh checkouts have no
# native/build/) so the TIFF/SVS/JP2K/NDPI/MIRAX test battery actually runs
# instead of module-skipping. Failures fall through to the existing skip.
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_lib = os.path.join(_root, "native", "build", "libtileingest.so")
if not os.path.isfile(_lib):
    import subprocess

    try:
        subprocess.run(
            ["bash", os.path.join(_root, "native", "build.sh")],
            capture_output=True, timeout=300, check=False,
        )
    except Exception:
        pass
