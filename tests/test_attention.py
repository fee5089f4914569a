import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuwsi.ops.attention import attention_reference, fused_attention, _flash_forward


def _rand_qkv(key, b=2, h=3, s=197, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    return q, k, v


def test_flash_matches_reference_interpret():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    ref = attention_reference(q, k, v)
    out = _flash_forward(q, k, v, None, q.shape[-1] ** -0.5, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3, rtol=8e-3)  # MXU bf16-input numerics


def test_flash_unaligned_seq_interpret():
    # 197 tokens (224/16 grid + cls) — exercises q/k padding paths.
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b=1, h=2, s=197, d=64)
    ref = attention_reference(q, k, v)
    out = _flash_forward(q, k, v, None, q.shape[-1] ** -0.5, 64, 64, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3, rtol=8e-3)  # MXU bf16-input numerics


def test_flash_kv_lengths_interpret():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b=3, h=2, s=128, d=32)
    lengths = jnp.array([128, 57, 1], dtype=jnp.int32)
    ref = attention_reference(q, k, v, kv_lengths=lengths)
    out = _flash_forward(q, k, v, lengths, q.shape[-1] ** -0.5, 64, 64, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3, rtol=8e-3)  # MXU bf16-input numerics


def test_fused_attention_grad_matches_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, h=2, s=64, d=32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2)


def test_cpu_dispatch_falls_back_to_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b=1, h=1, s=16, d=8)
    out = fused_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
