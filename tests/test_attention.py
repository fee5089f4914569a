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


def test_mha_qkv_sharded_batch_matches_reference():
    """custom_partitioning: the whole-seq kernel runs per-shard under a
    batch-sharded mesh axis; values AND grads must match the XLA path
    (VERDICT round-1 item 3 — multi-chip-usable Pallas attention)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    b, n, d, heads = 8, 197, 96, 3
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d), jnp.float32)
    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    scale = (d // heads) ** -0.5

    def loss_pallas(x):
        return jnp.sum(mha_from_qkv(x, heads, interpret=True) ** 2)

    def loss_ref(x):
        return jnp.sum(_mha_reference(x, heads, scale) ** 2)

    with mesh:
        out = jax.jit(lambda x: mha_from_qkv(x, heads, interpret=True))(qkv_sh)
        g = jax.jit(jax.grad(loss_pallas))(qkv_sh)
    ref = _mha_reference(qkv, heads, scale)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=8e-3, rtol=8e-3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-2, rtol=3e-2)


def test_flash_sharded_batch_matches_reference():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8,), ("data",))
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b=8, h=2, s=128, d=32)
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)

    with mesh:
        out = jax.jit(
            lambda a, b_, c: fused_attention(a, b_, c, interpret=True)
        )(qs, ks, vs)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    ref = attention_reference(q, k, v)
    g_ref = jax.grad(
        lambda a, b_, c: jnp.sum(attention_reference(a, b_, c) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=8e-3, rtol=8e-3)
    for a, b_ in zip(grads, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-2, rtol=3e-2)


def test_flash_kv_lengths_sharded_batch():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8,), ("data",))
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), b=8, h=2, s=128, d=32)
    lengths = jnp.asarray([128, 57, 1, 90, 128, 32, 64, 5], dtype=jnp.int32)
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ls = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    with mesh:
        out = jax.jit(
            lambda a, b_, c, l: fused_attention(a, b_, c, kv_lengths=l,
                                                interpret=True)
        )(qs, ks, vs, ls)
    ref = attention_reference(q, k, v, kv_lengths=lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=8e-3, rtol=8e-3)


def test_mha_qkv_packed_local_crops_matches_reference():
    """Sequence packing: short sequences (37-token local crops) are stacked
    pack=128//n per program with a block-diagonal mask — values and grads
    must match XLA, including a batch NOT divisible by the pack factor."""
    from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

    b, n, heads, d = 7, 37, 6, 96  # pack=3, b_pad=9 exercises batch padding
    qkv = jax.random.normal(jax.random.PRNGKey(7), (b, n, 3 * d), jnp.float32)
    scale = (d // heads) ** -0.5

    out = mha_from_qkv(qkv, heads, interpret=True, training=True)
    ref = _mha_reference(qkv, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=8e-3, rtol=8e-3)

    g = jax.grad(
        lambda x: jnp.sum(mha_from_qkv(x, heads, interpret=True,
                                       training=True) ** 2)
    )(qkv)
    g_ref = jax.grad(
        lambda x: jnp.sum(_mha_reference(x, heads, scale) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-2, rtol=3e-2)


def test_mha_qkv_packed_sharded_batch():
    """Packed short-sequence path under a batch-sharded mesh axis: the
    pad→reshape→kernel→reshape→slice chain must partition (custom_partitioning
    keeps the kernel per-shard; the reshapes are plain XLA)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8,), ("data",))
    b, n, heads, d = 24, 37, 3, 96  # 24/3-pack = 8 programs, 1 per device
    qkv = jax.random.normal(jax.random.PRNGKey(8), (b, n, 3 * d), jnp.float32)
    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    scale = (d // heads) ** -0.5

    with mesh:
        out = jax.jit(
            lambda x: mha_from_qkv(x, heads, interpret=True, training=True)
        )(qkv_sh)
        g = jax.jit(jax.grad(
            lambda x: jnp.sum(mha_from_qkv(x, heads, interpret=True,
                                           training=True) ** 2)
        ))(qkv_sh)
    ref = _mha_reference(qkv, heads, scale)
    g_ref = jax.grad(
        lambda x: jnp.sum(_mha_reference(x, heads, scale) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=8e-3, rtol=8e-3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-2, rtol=3e-2)


def test_flash_blockwise_backward_multitile_unaligned():
    """Blockwise flash backward across several q/k tiles with an unaligned
    sequence (197 → padded 256, tiles of 64): dq/dk/dv must match autodiff
    through the XLA reference — exercises tile accumulation order, padded-key
    masking, and padded-query zero-cotangent handling."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), b=2, h=2, s=197, d=32)

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_attention(q, k, v, tile_q=64, tile_k=64, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=2e-2)


def test_fused_attention_block_matches_reference():
    """Standalone pre-norm attention block op (LN1 + qkv GEMM + MHA + proj +
    residual in one kernel): values and all grads vs the composed XLA ops —
    both the packed short-sequence path and the 197-token path.
    (Not used in the train step — measured slower than separate ops there,
    see models/vit.py Block — but kept for small-batch inference.)"""
    from tpuwsi.ops.attention import _mha_reference, fused_attention_block

    def ref(x, g, be, wqkv, bqkv, wp, bp, h):
        xf = x
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
        ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        qkv = ln @ wqkv + bqkv
        d = x.shape[-1]
        o = _mha_reference(qkv, h, (d // h) ** -0.5)
        return x + o @ wp + bp

    for b, n, d, h in [(5, 37, 48, 2), (2, 197, 96, 3)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
        g = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
        be = 0.1 * jax.random.normal(ks[2], (d,))
        wqkv = jax.random.normal(ks[3], (d, 3 * d)) * 0.1
        bqkv = jax.random.normal(ks[4], (3 * d,)) * 0.05
        wp = jax.random.normal(ks[5], (d, d)) * 0.1
        bp = jax.random.normal(ks[6], (d,)) * 0.05
        args = (x, g, be, wqkv, bqkv, wp, bp)
        y = fused_attention_block(*args, h, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref(*args, h)),
                                   atol=1e-3, rtol=1e-3)
        gf = jax.grad(lambda a: jnp.sum(
            fused_attention_block(*a, h, interpret=True) ** 2))(args)
        gr = jax.grad(lambda a: jnp.sum(ref(*a, h) ** 2))(args)
        for a, r in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=5e-3, rtol=5e-3)


def test_wide_vmem_gate():
    """ADVICE r2 (medium): the wide-softmax kernel must refuse shapes whose
    backward scratch outgrows the requested VMEM limit (ViT-S at 448 px →
    seq_pad 896 → ~38 MB of f32 scratch) and accept ViT-length ones."""
    from tpuwsi.ops.attention import _wide_vmem_ok

    # ViT-S/16 @ 224: 197 tokens → seq_pad 256, 6 heads, D=384, bf16
    assert _wide_vmem_ok(6, 256, 384, 2)
    # ViT-S/16 @ 448: 785 tokens → seq_pad 896 — must be rejected
    assert not _wide_vmem_ok(6, 896, 384, 2)
    # ViT-B/16 @ 224: 197 tokens → seq_pad 256, 12 heads, D=768
    assert _wide_vmem_ok(12, 256, 768, 2)


def test_mha_qkv_over_budget_matches_reference():
    """Shapes beyond the wide-kernel VMEM budget must still produce correct
    attention (flash/XLA fallback path) with gradients."""
    from tpuwsi.ops.attention import mha_from_qkv, _mha_reference

    rng = np.random.default_rng(7)
    b, n, h, hd = 2, 600, 6, 16  # long enough to take the fallback branch
    d = h * hd
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)

    out = mha_from_qkv(qkv, num_heads=h, training=True)
    ref = _mha_reference(qkv, h, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g = jax.grad(lambda q: mha_from_qkv(q, num_heads=h, training=True).sum())(qkv)
    gref = jax.grad(lambda q: _mha_reference(q, h, hd ** -0.5).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=2e-4)


def test_flash_stats_fully_masked_row_lse_safe():
    """ADVICE r2 (low): a fully-masked element (kv_len == 0) must write a
    benign lse (0), not -1e30, so any future backward through the masked
    path cannot explode exp(s - lse)."""
    rng = np.random.default_rng(3)
    b, h, s, dm = 2, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, dm)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dm)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dm)), jnp.float32)
    lengths = jnp.array([0, s], jnp.int32)
    out, lse = _flash_forward(
        q, k, v, lengths, dm ** -0.5, 8, 8, interpret=True, return_stats=True
    )
    lse = np.asarray(lse).reshape(b, h, -1)
    assert np.all(lse[0] == 0.0), "masked rows must get lse == 0"
    assert np.all(np.isfinite(lse[1]))
    assert np.all(np.asarray(out)[0] == 0.0)


def test_mha_qkv_saved_probs_matches_recompute_path():
    """attn_save_probs: the saved-probabilities VJP (backward skips the
    QK^T + softmax recompute) must match the recompute VJP and the XLA
    reference — values and grads, unpadded (197) and padded (150) lengths."""
    from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

    heads = 3
    for n in (197, 150):
        d = 96
        qkv = jax.random.normal(jax.random.PRNGKey(2), (4, n, 3 * d),
                                jnp.float32)
        scale = (d // heads) ** -0.5

        def f_saved(x):
            return jnp.sum(mha_from_qkv(x, heads, interpret=True,
                                        training=True, save_probs=True) ** 2)

        def f_base(x):
            return jnp.sum(mha_from_qkv(x, heads, interpret=True,
                                        training=True) ** 2)

        def f_ref(x):
            return jnp.sum(_mha_reference(x, heads, scale) ** 2)

        out_s = mha_from_qkv(qkv, heads, interpret=True, training=True,
                             save_probs=True)
        out_b = mha_from_qkv(qkv, heads, interpret=True, training=True)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                                   atol=1e-5, rtol=1e-5)
        g_s = jax.jit(jax.grad(f_saved))(qkv)
        g_b = jax.jit(jax.grad(f_base))(qkv)
        g_r = jax.grad(f_ref)(qkv)
        # saved-p backward vs recompute backward: same math, bf16-p rounding
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_b),
                                   atol=1e-4, rtol=1e-4, err_msg=f"n={n}")
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                                   atol=3e-2, rtol=3e-2, err_msg=f"n={n}")


def test_mha_qkv_saved_probs_packed_matches_reference():
    """Saved-probs under backbone-level sequence packing: the saved p bakes
    the block-diagonal mask in; grads must match the reference per crop."""
    from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

    heads, n, d = 3, 37, 96  # 37-token local crops -> pack 3 per program
    qkv = jax.random.normal(jax.random.PRNGKey(3), (6, n, 3 * d), jnp.float32)
    scale = (d // heads) ** -0.5

    def f_saved(x):
        return jnp.sum(mha_from_qkv(x, heads, interpret=True, training=True,
                                    save_probs=True) ** 2)

    def f_ref(x):
        return jnp.sum(_mha_reference(x, heads, scale) ** 2)

    out = mha_from_qkv(qkv, heads, interpret=True, training=True,
                       save_probs=True)
    ref = _mha_reference(qkv, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=8e-3, rtol=8e-3)
    g = jax.jit(jax.grad(f_saved))(qkv)
    g_ref = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-2, rtol=3e-2)


def test_mha_qkv_saved_probs_sharded_batch():
    """custom_partitioning of the saved-probs pair under a batch-sharded
    mesh: per-shard lowering, grads match the reference."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    b, n, d, heads = 8, 197, 96, 3
    qkv = jax.random.normal(jax.random.PRNGKey(4), (b, n, 3 * d), jnp.float32)
    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    scale = (d // heads) ** -0.5

    def loss(x):
        return jnp.sum(mha_from_qkv(x, heads, interpret=True, training=True,
                                    save_probs=True) ** 2)

    def loss_ref(x):
        return jnp.sum(_mha_reference(x, heads, scale) ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))(qkv_sh)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-2, rtol=3e-2)
