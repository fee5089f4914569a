"""Multi-host wiring and dp×tp semantics (VERDICT r2 #3 and #8).

Reference equivalents: torchrun + DDP init (train.py:431, sbatch-ssl.sh:55),
DistributedSampler rank striding (train.py:732), world-size LR scaling
(train.py:569-581). Tested under a faked 2-process layout: the stride logic
takes process_index/process_count explicitly, so no real multi-process run
is needed to verify disjointness/coverage.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from tpuwsi.core.mesh import MeshConfig, create_mesh, shard_batch
from tpuwsi.io import grid_data_columns, grid_file_path, save_grid_pickle
from tpuwsi.train import (
    OptimConfig,
    compile_step,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from tpuwsi.utils.minixlsx import write_xlsx


@pytest.fixture
def small_cohort(tmp_path):
    root = tmp_path / "Breast" / "TCGA"
    os.makedirs(root / "Grids_10")
    rng = np.random.default_rng(0)
    files, counts = [], []
    for i in range(8):
        name = f"s{i}.png"
        arr = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / name)
        grid = [(r, c) for r in range(0, 96, 32) for c in range(0, 96, 32)]
        save_grid_pickle(str(grid_file_path(str(root), name, 10, 32)), grid)
        files.append(name)
        counts.append(len(grid))
    total_col, legit_col = grid_data_columns(32, 10)
    write_xlsx(str(root / "slides_data_TCGA.xlsx"), pd.DataFrame({
        "file": files, "id": ["TCGA"] * 8,
        "patient barcode": [f"P{i}" for i in range(8)],
        "ER status": ["Positive", "Negative"] * 4,
        "test fold idx": [2] * 8,
        "Manipulated Objective Power": [10] * 8, "DX": [True] * 8,
    }))
    write_xlsx(str(root / "Grids_10" / "Grid_data.xlsx"), pd.DataFrame(
        {"file": files, total_col: counts, legit_col: counts}))
    return str(tmp_path)


def test_sampler_process_stride_disjoint_and_complete(small_cohort):
    """Faked 2-process layout: per-process batches draw disjoint slide sets
    that together cover the epoch (DistributedSampler parity)."""
    from tpuwsi.io.metadata import load_slide_table
    from tpuwsi.io.wsi import WSITileSampler

    table = load_slide_table(
        "TCGA", tile_size=32, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=1, desired_magnification=10,
        data_root=small_cohort,
    )
    sampler = WSITileSampler(table, n_tiles=1, num_threads=2)
    seen = []
    for p in (0, 1):
        rng = np.random.default_rng(11)  # SAME seed on both "hosts"
        got = []
        for batch in sampler.batches(rng, 2, process_index=p, process_count=2):
            got.extend(batch["slide_indices"].tolist())
            assert batch["images"].shape == (2, 32, 32, 3)
        seen.append(set(got))
    assert not (seen[0] & seen[1]), "per-process batches overlap"
    assert seen[0] | seen[1] == set(range(len(table)))


def test_folder_process_stride_disjoint(tmp_path):
    from tpuwsi.io.folder import ImageFolderDataset

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "c0")
    for i in range(8):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / "c0" / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path))
    sums = []
    for p in (0, 1):
        got = []
        for b in ds.batches(2, rng=np.random.default_rng(5), shuffle=True,
                            process_index=p, process_count=2):
            got.extend(b["images"].sum(axis=(1, 2, 3)).tolist())
        sums.append(set(got))
    assert not (sums[0] & sums[1])
    assert len(sums[0] | sums[1]) == 8


def test_lr_world_size_scaling():
    """train.py:569-581: lr = base_lr * (batch x world) / base_size."""
    cfg = OptimConfig(base_lr=0.1, lr_base_size=512, lr_base_scale="linear")
    assert np.isclose(cfg.resolved_lr(256 * 2), 0.1)
    assert np.isclose(cfg.resolved_lr(256), 0.05)
    sqrt_cfg = OptimConfig(base_lr=0.1, lr_base_size=512, lr_base_scale="sqrt")
    assert np.isclose(sqrt_cfg.resolved_lr(2048), 0.2)


def _vit_s_geometry_model():
    """ViT-S geometry (embed 384, 6 heads) at depth 2 — the full-size dp x tp
    gradient-equality check the round-2 verdict asked for (#8)."""
    import dataclasses

    from tpuwsi.models.vit import VisionTransformer, vit_small

    cfg = vit_small(
        num_classes=2, img_size=32, use_pallas_attention=False,
        dtype=jnp.float32,
    )
    cfg = dataclasses.replace(cfg, depth=2)
    return VisionTransformer(cfg)


def test_dp_tp_grad_matches_single_device_vit_s_geometry():
    from tpuwsi.parallel.sharding import shard_params

    model = _vit_s_geometry_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ocfg = OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=8)
    step = make_train_step(model.apply, tx, augment_fn=None)

    imgs = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
    labels = np.arange(8) % 2
    batch = {"images": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
    rng = jax.random.PRNGKey(3)

    state1 = create_train_state(params, tx)
    s1, m1 = jax.jit(step)(state1, batch, rng)

    mesh = create_mesh(MeshConfig(data=4, model=2))
    with mesh:
        tp_params = shard_params(mesh, params)
        # at least one big GEMM weight must actually be model-sharded
        specs = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda p: str(p.sharding.spec), tp_params)
        )
        assert any("model" in s for s in specs), "TP rules matched nothing"
        state2 = create_train_state(tp_params, tx)
        jit_step = compile_step(step, mesh, state2, donate=False,
                                keep_state_sharding=True)
        sharded = shard_batch(mesh, {"images": imgs, "labels": np.asarray(labels)})
        s2, m2 = jit_step(state2, sharded, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_cli_model_parallel_smoke(tmp_path):
    """--model-parallel 2 end-to-end through the CLI on the 8-device mesh."""
    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "data" / cls)
        for i in range(8):
            arr = np.clip(rng.normal(base, 20, (32, 32, 3)), 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "data" / cls / f"{i}.png")
    out = str(tmp_path / "runs")
    state = main([
        "--data-dir", str(tmp_path / "data"),
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "100",
        "--val-split", "0",
        "--model-parallel", "2",
    ])
    assert int(state.step) == 2
    # a TP-sharded leaf exists and training still ran
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda p: str(p.sharding), state.params)
    )
    assert any("model" in s for s in specs)


def test_cli_ssl_model_parallel_smoke(tmp_path):
    """--ssl --model-parallel 2: the DINO loop assembles through
    ssl_step_bundle (round-4 refactor), which applies the TP layout via its
    shard_fn hook — student params must carry a 'model'-axis sharding and a
    step must execute on the dp×tp mesh."""
    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "data" / cls)
        for i in range(8):
            arr = np.clip(rng.normal(base, 20, (32, 32, 3)), 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "data" / cls / f"{i}.png")
    out = str(tmp_path / "runs")
    state = main([
        "--ssl",
        "--data-dir", str(tmp_path / "data"),
        "--model", "vit_tiny_patch16_224",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0",
        "--lr", "1e-4",
        "--dino-out-dim", "128",
        "--dino-global-size", "32",
        "--dino-local-size", "16",
        "--dino-local-crops", "2",
        "--model-parallel", "2",
        "--output", out,
    ])
    assert int(state.step) == 1
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda p: str(p.sharding), state.student_params)
    )
    assert any("model" in s for s in specs)


def test_sequence_parallel_mil_pool_matches_single_device():
    """SURVEY §5.7: the MIL bag axis shards over the mesh; the sharded
    softmax-pool (pmax/psum) must match the single-device pool bitwise-ish,
    including padded tiles and the fully-masked degenerate bag."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuwsi.core.mesh import MeshConfig, create_mesh
    from tpuwsi.models.mil import masked_attention_pool, sharded_attention_pool

    mesh = create_mesh(MeshConfig(data=8))
    rng = np.random.default_rng(0)
    B, N, D = 3, 64, 16
    scores = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N)) < 0.7)
    mask = mask.at[1].set(False)  # fully-masked bag → uniform attention
    mask = mask.at[0, :4].set(True)

    ref_pool, ref_before, ref_after = masked_attention_pool(scores, feats, mask)
    with mesh:
        pool, before, after = jax.jit(
            lambda s, f, m: sharded_attention_pool(mesh, s, f, m)
        )(scores, feats, mask)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(after), np.asarray(ref_after),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(before), np.asarray(ref_before),
                               rtol=1e-6)


def test_bn_batch_stats_global_under_gspmd_sync_bn_native():
    """SyncBN is native under GSPMD (round-4 VERDICT item 5, PARITY.md
    "SyncBN native-always-on"): with the batch sharded over 8 devices, the
    jitted BN train step must compute batch statistics over the GLOBAL
    batch — exactly what --sync-bn / --dist-bn buy the reference
    (train.py:542-554,928-931) — so batch_stats, params, and loss after one
    step must equal the single-device run on the same global batch.

    Uses the trainable resnet18 (torchvision geometry, BatchNorm stats in
    TrainState.batch_stats) in fp32."""
    from tpuwsi.models.resnet_trunc import make_resnet

    model = make_resnet("resnet18", num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = {"params": variables["params"]}
    tx, _ = make_optimizer(OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0),
                           params, global_batch_size=8)
    step = make_train_step(model.apply, tx, augment_fn=None,
                           compute_auc=False, use_batch_stats=True)

    rngnp = np.random.default_rng(7)
    # per-device shards must have DIFFERENT distributions, or per-shard
    # stats would accidentally equal global stats: scale each example
    imgs = rngnp.random((8, 32, 32, 3)).astype(np.float32)
    imgs *= np.linspace(0.2, 1.8, 8)[:, None, None, None].astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int32)
    batch = {"images": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
    rng = jax.random.PRNGKey(3)

    state1 = create_train_state(params, tx,
                                batch_stats=variables["batch_stats"])
    s1, m1 = jax.jit(step)(state1, batch, rng)

    mesh = create_mesh(MeshConfig(data=8))
    with mesh:
        state2 = create_train_state(params, tx,
                                    batch_stats=variables["batch_stats"])
        jit_step = compile_step(step, mesh, state2, donate=False)
        sharded = shard_batch(mesh, {"images": imgs, "labels": labels})
        s2, m2 = jit_step(state2, sharded, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # batch_stats are the SyncBN claim: global-batch mean/var on all 8
    # devices, not per-shard stats
    flat1, tree1 = jax.tree_util.tree_flatten(s1.batch_stats)
    flat2, tree2 = jax.tree_util.tree_flatten(s2.batch_stats)
    assert tree1 == tree2
    assert len(flat1) > 0, "resnet18 must expose batch_stats"
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg="batch_stats diverge: BN stats "
                                   "are per-shard, not global (SyncBN)")
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
