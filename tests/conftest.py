"""Test config: force an 8-virtual-device CPU mesh so DP/TP semantics are
testable without TPU hardware (SURVEY §4).

Note: the env var JAX_PLATFORMS is overridden by the TPU PJRT plugin in this
image, so we force CPU via jax.config (which wins) before any device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
