"""Driver-contract tests for __graft_entry__.py.

The round-1 driver recorded MULTICHIP ok=false because dryrun_multichip ran in
a process pinned to the single real TPU (axon plugin overrides JAX_PLATFORMS).
These tests pin both recovery paths:

- inline: enough local devices (the conftest 8-CPU mesh) -> runs in-process
- re-exec: more devices requested than available -> a subprocess must force an
  n-device CPU platform and still succeed
"""

import importlib.util
import os

import jax
import pytest


def _load_entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_inline_8(capsys):
    mod = _load_entry()
    assert len(jax.devices()) >= 8
    mod.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out


def test_dryrun_multichip_reexec_when_too_few_devices(capsys):
    """Requesting more devices than the live process has must re-exec a
    subprocess with a forced CPU platform — the exact failure mode recorded in
    MULTICHIP_r01.json (driver process saw only the 1 real TPU)."""
    mod = _load_entry()
    n = len(jax.devices()) * 2
    mod.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
