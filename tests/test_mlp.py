import jax
import jax.numpy as jnp
import numpy as np

from tpuwsi.ops.mlp import fused_mlp


def _make(rows=100, d=64, f=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (2, rows, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, f)) * 0.05
    b1 = jax.random.normal(ks[2], (f,)) * 0.05
    w2 = jax.random.normal(ks[3], (f, d)) * 0.05
    b2 = jax.random.normal(ks[4], (d,)) * 0.05
    return x, w1, b1, w2, b2


def _ref(x, w1, b1, w2, b2, approx):
    return jax.nn.gelu(x @ w1 + b1, approximate=approx) @ w2 + b2


def test_fused_mlp_matches_reference():
    """Fused MLP kernel (hidden activation VMEM-resident, ragged row edge)
    vs plain XLA: values and ALL grads (x, W1, b1, W2, b2)."""
    for approx in (True, False):
        args = _make(rows=100)
        y = fused_mlp(*args, approx=approx, interpret=True)
        yr = _ref(*args, approx)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   atol=1e-4, rtol=1e-4)
        gf = jax.grad(
            lambda a: jnp.sum(fused_mlp(*a, approx=approx,
                                        interpret=True) ** 2)
        )(args)
        gr = jax.grad(lambda a: jnp.sum(_ref(*a, approx) ** 2))(args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)


def test_fused_mlp_sharded_rows_psums_weight_grads():
    """Row (batch) axis sharded over the mesh: dX stays row-sharded while
    dW/db are psummed across shards — must equal the unsharded grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8,), ("data",))
    x, w1, b1, w2, b2 = _make(rows=64, d=32, f=128, seed=1)
    x = x.reshape(8, 16, 32)  # leading dim divisible by the mesh
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

    def loss(a):
        return jnp.sum(fused_mlp(*a, approx=True, interpret=True) ** 2)

    with mesh:
        g_sh = jax.jit(jax.grad(loss))((x_sh, w1, b1, w2, b2))
    g = jax.grad(loss)((x, w1, b1, w2, b2))
    for a, b in zip(g_sh, g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_vit_with_fused_mlp_matches_unfused():
    """ViT forward+grads with the Pallas MLP path (interpret) vs the plain
    XLA path — same params, same outputs."""
    import dataclasses

    from tpuwsi.models.vit import VisionTransformer, vit_tiny

    base = dataclasses.replace(
        vit_tiny(num_classes=0, img_size=32, dtype=jnp.float32,
                 use_pallas_attention=False),
        depth=2, embed_dim=64, num_heads=2,
    )
    on = dataclasses.replace(base, use_pallas_attention=True,
                             pallas_interpret=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    m_off = VisionTransformer(base)
    m_on = VisionTransformer(on)
    params = m_off.init(jax.random.PRNGKey(1), x)

    np.testing.assert_allclose(
        np.asarray(m_on.apply(params, x)),
        np.asarray(m_off.apply(params, x)),
        atol=2e-4, rtol=2e-4,
    )
    g_on = jax.grad(lambda p: m_on.apply(p, x).sum())(params)
    g_off = jax.grad(lambda p: m_off.apply(p, x).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_on),
                    jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_fused_ln_gemm_and_gemm_residual_match_reference():
    """Standalone row-tiled LN+GEMM and GEMM+residual ops: values and grads
    vs composed XLA. (Measured slower than XLA's own prologue/epilogue
    fusions inside the DINO step — kept as ops; see models/vit.py Block.)"""
    from tpuwsi.ops.mlp import fused_gemm_residual, fused_ln_gemm

    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    B, N, D, F = 3, 37, 64, 192
    x = jax.random.normal(ks[0], (B, N, D), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    be = 0.1 * jax.random.normal(ks[2], (D,))
    w = jax.random.normal(ks[3], (D, F)) * 0.1
    b = jax.random.normal(ks[4], (F,)) * 0.05

    def ref_lg(x, g, be, w, b):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(x * x, -1, keepdims=True) - mu * mu
        ln = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        return ln @ w + b

    a1 = (x, g, be, w, b)
    np.testing.assert_allclose(
        np.asarray(fused_ln_gemm(*a1, interpret=True)),
        np.asarray(ref_lg(*a1)), atol=1e-4, rtol=1e-4,
    )
    gf = jax.grad(lambda a: jnp.sum(fused_ln_gemm(*a, interpret=True) ** 2))(a1)
    gr = jax.grad(lambda a: jnp.sum(ref_lg(*a) ** 2))(a1)
    for p, q in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=1e-3, rtol=1e-3)

    res = jax.random.normal(ks[5], (B, N, F), jnp.float32)
    a2 = (res, x, w, b)
    np.testing.assert_allclose(
        np.asarray(fused_gemm_residual(*a2, interpret=True)),
        np.asarray(res + x @ w + b), atol=1e-4, rtol=1e-4,
    )
    gf2 = jax.grad(
        lambda a: jnp.sum(fused_gemm_residual(*a, interpret=True) ** 2)
    )(a2)
    gr2 = jax.grad(lambda a: jnp.sum((a[0] + a[1] @ a[2] + a[3]) ** 2))(a2)
    for p, q in zip(gf2, gr2):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=1e-3, rtol=1e-3)


def test_vit_b_width_falls_back_cleanly():
    """The fused-MLP VMEM guard: ViT-B-width (768/3072) exceeds the
    backward's VMEM working set, so dispatch must fall back to the unfused
    path without error (and _bwd_vmem_ok reflects the split)."""
    import dataclasses

    from tpuwsi.models.vit import VisionTransformer, vit_base
    from tpuwsi.ops.mlp import _bwd_vmem_ok

    assert _bwd_vmem_ok(384, 1536)      # ViT-S: kernel path
    assert not _bwd_vmem_ok(768, 3072)  # ViT-B: fallback

    cfg = dataclasses.replace(
        vit_base(num_classes=0, img_size=32, dtype=jnp.float32,
                 use_pallas_attention=True, pallas_interpret=True,
                 gelu_approx=True),
        depth=1,
    )
    m = VisionTransformer(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    assert np.isfinite(np.asarray(m.apply(p, x))).all()
