"""Hybrid dense (XLA forward + Pallas dual-output backward, ops/dense.py)
and hybrid MLP (ops/mlp.hybrid_mlp) — gradient parity vs plain XLA, sharded
weight-grad psum, and the model-level toggles."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuwsi.ops.dense import hybrid_dense
from tpuwsi.ops.mlp import hybrid_mlp


def _make_dense(rows=100, d=64, n=192, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (2, rows, d), jnp.float32)
    w = jax.random.normal(ks[1], (d, n)) * 0.05
    b = jax.random.normal(ks[2], (n,)) * 0.05
    return x, w, b


def test_hybrid_dense_matches_xla():
    """Values and all grads (x, w, b) vs the plain XLA dense — the forward
    is literally XLA; the backward is the Pallas dual-output kernel."""
    x, w, b = _make_dense()
    y = hybrid_dense(x, w, b, interpret=True)
    yr = x @ w + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5,
                               rtol=1e-5)
    gh = jax.grad(
        lambda a: jnp.sum(hybrid_dense(*a, interpret=True) ** 2)
    )((x, w, b))
    gr = jax.grad(lambda a: jnp.sum((a[0] @ a[1] + a[2]) ** 2))((x, w, b))
    for a, r in zip(gh, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-3)


def test_hybrid_dense_no_bias():
    x, w, _ = _make_dense(seed=1)
    y = hybrid_dense(x, w, None, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), atol=1e-5,
                               rtol=1e-5)
    gh = jax.grad(
        lambda a: jnp.sum(hybrid_dense(a[0], a[1], None, interpret=True) ** 2)
    )((x, w))
    gr = jax.grad(lambda a: jnp.sum((a[0] @ a[1]) ** 2))((x, w))
    for a, r in zip(gh, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-3)


def test_hybrid_dense_ragged_rows():
    """Row count not divisible by the tile: the OOB mask must keep dW/db
    exact (garbage tail rows would corrupt the VMEM accumulators)."""
    x, w, b = _make_dense(rows=37, d=32, n=64, seed=2)
    gh = jax.grad(
        lambda a: jnp.sum(hybrid_dense(*a, interpret=True) ** 2)
    )((x, w, b))
    gr = jax.grad(lambda a: jnp.sum((a[0] @ a[1] + a[2]) ** 2))((x, w, b))
    for a, r in zip(gh, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-3)


def test_hybrid_dense_sharded_rows_psums_weight_grads():
    """Batch rows sharded over the mesh: dx stays row-sharded, dW/db are
    psummed — must equal the unsharded grads (custom_partitioning rule)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8,), ("data",))
    x, w, b = _make_dense(rows=16, d=32, n=64, seed=3)
    x = x.reshape(8, 4, 32)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

    def loss(a):
        return jnp.sum(hybrid_dense(*a, interpret=True) ** 2)

    with mesh:
        g_sh = jax.jit(jax.grad(loss))((x_sh, w, b))
    g = jax.grad(loss)((x, w, b))
    for a, r in zip(g_sh, g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-3)


def _make_mlp(rows=100, d=64, f=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (2, rows, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, f)) * 0.05
    b1 = jax.random.normal(ks[2], (f,)) * 0.05
    w2 = jax.random.normal(ks[3], (f, d)) * 0.05
    b2 = jax.random.normal(ks[4], (d,)) * 0.05
    return x, w1, b1, w2, b2


def test_hybrid_mlp_matches_xla():
    """XLA forward + the fused Pallas MLP backward: values bit-match the
    XLA forward; grads match the XLA VJP within kernel tolerance."""
    args = _make_mlp()

    def ref(x, w1, b1, w2, b2):
        return jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2

    y = hybrid_mlp(*args, approx=True, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(*args)),
                               atol=1e-6, rtol=1e-6)
    gh = jax.grad(
        lambda a: jnp.sum(hybrid_mlp(*a, approx=True, interpret=True) ** 2)
    )(args)
    gr = jax.grad(lambda a: jnp.sum(ref(*a) ** 2))(args)
    for a, r in zip(gh, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-3)


def test_vit_hybrid_bwd_toggles_match_baseline():
    """Full ViT: mlp_pallas_bwd + dense_pallas_bwd produce the same forward
    (bitwise: the forward IS XLA) and matching param grads, with an
    identical parameter tree."""
    from tpuwsi.models.vit import ViTConfig, VisionTransformer

    base_cfg = dict(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        num_classes=0, use_pallas_attention=False, use_fused_mlp=False,
        gelu_approx=True, dtype=jnp.float32, drop_path_rate=0.0,
    )
    m0 = VisionTransformer(ViTConfig(**base_cfg))
    m1 = VisionTransformer(ViTConfig(
        **base_cfg, mlp_pallas_bwd=True, dense_pallas_bwd=True,
        pallas_interpret=True,
    ))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m0.init(jax.random.PRNGKey(1), x)
    assert (
        jax.tree_util.tree_structure(params)
        == jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(1), x))
    )

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x, deterministic=True) ** 2)

    y0, y1 = m0.apply(params, x), m1.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5,
                               rtol=1e-5)
    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for (k0, a), (k1, r) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert str(k0) == str(k1)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-3, rtol=2e-3,
            err_msg=str(k0),
        )
