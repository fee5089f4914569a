"""Hardware-only kernel-path checks.

Interpret-mode tests validate NUMERICS but not Mosaic's block-shape rules —
the flash stats/backward path shipped two rounds with (1, tile_q) row-vector
blocks that are illegal on real TPU (BENCH.md round-3 "Long-sequence
attention"). These tests compile + run every dispatch path on the chip; they
skip on the CPU test mesh (conftest forces CPU, so run them explicitly with
TPUWSI_TPU_TESTS=1 from a TPU-attached session:
``TPUWSI_TPU_TESTS=1 python -m pytest tests/test_tpu_kernel_paths.py``).
"""

import os

import numpy as np
import pytest

if not os.environ.get("TPUWSI_TPU_TESTS"):
    pytest.skip(
        "hardware kernel-path checks (set TPUWSI_TPU_TESTS=1 on a "
        "TPU-attached session)",
        allow_module_level=True,
    )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if jax.default_backend() != "tpu":
    pytest.skip("no TPU attached", allow_module_level=True)


def test_flash_differentiable_path_compiles_on_tpu():
    """S beyond the whole-seq VMEM budget → stats forward + blockwise bwd."""
    from tpuwsi.ops.attention import attention_reference, fused_attention

    rng = np.random.default_rng(0)
    b, h, s, d = 2, 6, 1024, 64
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.bfloat16)
        for _ in range(3)
    )

    def loss(q, k, v):
        return fused_attention(q, k, v).astype(jnp.float32).sum()

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()
    out = np.asarray(jax.jit(fused_attention)(q, k, v), np.float32)
    ref = np.asarray(jax.jit(attention_reference)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_masked_flash_path_on_tpu():
    from tpuwsi.ops.attention import attention_reference, fused_attention

    rng = np.random.default_rng(1)
    b, h, s, d = 4, 6, 512, 64
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.bfloat16)
        for _ in range(3)
    )
    lens = jnp.asarray([512, 300, 37, 1], jnp.int32)
    out = np.asarray(
        jax.jit(lambda q, k, v: fused_attention(q, k, v, kv_lengths=lens))(
            q, k, v
        ),
        np.float32,
    )
    ref = np.asarray(
        jax.jit(
            lambda q, k, v: attention_reference(q, k, v, kv_lengths=lens)
        )(q, k, v),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_over_vmem_wide_fallback_trains_on_tpu():
    """ViT-S @ 448 px (785 tokens) exceeds the wide kernel's VMEM budget —
    the training dispatch must fall through to the flash kernel and its
    gradient must compile + be finite (broken before the round-3 block-spec
    fix)."""
    from tpuwsi.ops.attention import mha_from_qkv

    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(0, 0.5, (4, 785, 3 * 384)), jnp.bfloat16)

    def loss(qkv):
        return mha_from_qkv(qkv, num_heads=6, training=True).astype(
            jnp.float32
        ).sum()

    g = np.asarray(jax.jit(jax.grad(loss))(qkv), np.float32)
    assert np.isfinite(g).all()


def test_saved_probs_grads_match_recompute_on_tpu():
    """attn_save_probs on the chip: the saved-p VJP (Mosaic-compiled, not
    interpret mode) must match the recompute VJP — values and grads, at the
    DINO step's two geometries (197-token globals, packed 37-token locals)."""
    from tpuwsi.ops.attention import mha_from_qkv

    rng = np.random.default_rng(1)
    for b, n in ((4, 197), (6, 37)):
        d, heads = 384, 6
        qkv = jnp.asarray(rng.normal(0, 1, (b, n, 3 * d)), jnp.bfloat16)

        def f(x, sp):
            return (
                mha_from_qkv(x, heads, training=True, save_probs=sp)
                .astype(jnp.float32) ** 2
            ).sum()

        o_s = np.asarray(jax.jit(
            lambda x: mha_from_qkv(x, heads, training=True, save_probs=True)
        )(qkv), np.float32)
        o_b = np.asarray(jax.jit(
            lambda x: mha_from_qkv(x, heads, training=True)
        )(qkv), np.float32)
        np.testing.assert_allclose(o_s, o_b, atol=1e-3, err_msg=f"n={n}")
        g_s = np.asarray(jax.jit(jax.grad(lambda x: f(x, True)))(qkv),
                         np.float32)
        g_b = np.asarray(jax.jit(jax.grad(lambda x: f(x, False)))(qkv),
                         np.float32)
        assert np.isfinite(g_s).all()
        np.testing.assert_allclose(g_s, g_b, atol=3e-2, rtol=3e-2,
                                   err_msg=f"n={n}")
