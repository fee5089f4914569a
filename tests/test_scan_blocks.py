import dataclasses

import flax
import jax
import jax.numpy as jnp
import numpy as np

from tpuwsi.models.vit import VisionTransformer, vit_tiny


def _cfg(scan):
    return dataclasses.replace(
        vit_tiny(num_classes=0, img_size=32, dtype=jnp.float32,
                 use_pallas_attention=False),
        depth=3, embed_dim=64, num_heads=2, scan_blocks=scan,
    )


def _stack_loop_params_into_scan(loop_params, scan_params):
    """blocks_0..blocks_{D-1} trees → stacked blocks_scan tree."""
    lp = flax.traverse_util.flatten_dict(flax.core.unfreeze(loop_params))
    sp = flax.traverse_util.flatten_dict(flax.core.unfreeze(scan_params))
    out = dict(sp)
    for path in sp:
        if path[1] == "blocks_scan":
            rest = path[2:]
            stacked = jnp.stack(
                [lp[("params", f"blocks_{i}") + rest] for i in range(3)]
            )
            out[path] = stacked
        else:
            out[path] = lp[path]
    return flax.traverse_util.unflatten_dict(out)


def test_scan_blocks_match_loop_blocks():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    loop_model = VisionTransformer(_cfg(False))
    scan_model = VisionTransformer(_cfg(True))
    loop_params = loop_model.init(jax.random.PRNGKey(1), x)
    scan_params = scan_model.init(jax.random.PRNGKey(2), x)
    scan_params = _stack_loop_params_into_scan(loop_params, scan_params)

    out_loop = np.asarray(loop_model.apply(loop_params, x))
    out_scan = np.asarray(scan_model.apply(scan_params, x))
    np.testing.assert_allclose(out_scan, out_loop, atol=1e-5, rtol=1e-5)


def test_scan_blocks_match_loop_blocks_with_active_droppath():
    """Stochastic-depth masks come from ONE top-level draw (exp_prod4
    restructure), so scan and loop paths consume the SAME masks given the
    same 'droppath' rng — train-mode outputs must match exactly, not just
    distributionally."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    loop_model = VisionTransformer(
        dataclasses.replace(_cfg(False), drop_path_rate=0.5))
    scan_model = VisionTransformer(
        dataclasses.replace(_cfg(True), drop_path_rate=0.5))
    loop_params = loop_model.init(jax.random.PRNGKey(1), x)
    scan_params = scan_model.init(jax.random.PRNGKey(2), x)
    scan_params = _stack_loop_params_into_scan(loop_params, scan_params)

    rngs = {"droppath": jax.random.PRNGKey(7)}
    out_loop = np.asarray(
        loop_model.apply(loop_params, x, deterministic=False, rngs=rngs))
    out_scan = np.asarray(
        scan_model.apply(scan_params, x, deterministic=False, rngs=rngs))
    # something must actually drop at rate 0.5, or this test proves nothing
    out_det = np.asarray(loop_model.apply(loop_params, x))
    assert not np.allclose(out_loop, out_det, atol=1e-5)
    np.testing.assert_allclose(out_scan, out_loop, atol=1e-5, rtol=1e-5)


def test_scan_blocks_droppath_trains():
    cfg = dataclasses.replace(_cfg(True), drop_path_rate=0.2)
    model = VisionTransformer(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2), "droppath": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()


def test_scan_remat_matches_scan():
    """remat-in-scan (the HBM-OOM fix for the scanned DINO step) must be a
    pure memory/recompute trade: values and grads identical to plain scan."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    scan_model = VisionTransformer(_cfg(True))
    remat_model = VisionTransformer(
        dataclasses.replace(_cfg(True), remat_blocks=True)
    )
    params = scan_model.init(jax.random.PRNGKey(1), x)

    out_scan = np.asarray(scan_model.apply(params, x))
    out_remat = np.asarray(remat_model.apply(params, x))
    np.testing.assert_allclose(out_remat, out_scan, atol=1e-6, rtol=1e-6)

    g_scan = jax.grad(lambda p: scan_model.apply(p, x).sum())(params)
    g_remat = jax.grad(lambda p: remat_model.apply(p, x).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_scan_blocks_train_mode_with_zero_droppath():
    """drop_path_rate=0 in TRAIN mode must be a clean no-op on the scan
    path. Regression: the one-draw mask restructure fed the scan body a
    (depth, 2, 1, 1, 1) dummy mask when no masks were drawn, whose
    reshape/repeat to the residual shape crashed for batch > 1 — rate 0
    must skip drop-path entirely (droppath_active)."""
    cfg = dataclasses.replace(_cfg(True), drop_path_rate=0.0)
    model = VisionTransformer(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out_train = np.asarray(model.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2),
              "droppath": jax.random.PRNGKey(3)},
    ))
    # rate 0 and no other stochastic regularizer active: train == eval
    out_det = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(out_train, out_det, atol=1e-6, rtol=1e-6)
