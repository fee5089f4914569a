"""End-to-end chain test (SURVEY §3 call stacks glued together):
DINO SSL pretrain → feature extraction over slides → reference-format .data
export → MIL head training → slide AUC. Tiny model, synthetic cohort.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from tpuwsi.infer import SlideAggregator, SlideWalker
from tpuwsi.io import grid_data_columns, grid_file_path, save_grid_pickle
from tpuwsi.io.metadata import load_slide_table
from tpuwsi.mil import FeaturesMILDataset, train_mil_head
from tpuwsi.models import DINOHead
from tpuwsi.models.vit import VisionTransformer, vit_tiny
from tpuwsi.preprocess import make_recipe
from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
from tpuwsi.ssl_dino import (
    DINOConfig,
    DINOModel,
    create_dino_state,
    make_dino_train_step,
)
from tpuwsi.ssl_dino.knn import knn_accuracy
from tpuwsi.train import OptimConfig, make_optimizer
from tpuwsi.utils.minixlsx import write_xlsx


@pytest.fixture
def cohort(tmp_path):
    root = tmp_path / "Breast" / "TCGA"
    os.makedirs(root / "Grids_10")
    rng = np.random.default_rng(0)
    files, folds, targets, counts = [], [], [], []
    for i in range(6):
        name = f"s{i}.png"
        # positives: bright blobs on dark bg; negatives: uniform mid-gray —
        # separable by mean features even from a random encoder
        if i % 2 == 0:
            arr = np.clip(rng.normal(200, 30, (256, 256, 3)), 0, 255)
        else:
            arr = np.clip(rng.normal(70, 10, (256, 256, 3)), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(root / name)
        grid = [(r, c) for r in range(0, 224, 32) for c in range(0, 224, 32)]
        save_grid_pickle(str(grid_file_path(str(root), name, 10, 32)), grid)
        files.append(name)
        folds.append(1)
        targets.append("Positive" if i % 2 == 0 else "Negative")
        counts.append(len(grid))
    total_col, legit_col = grid_data_columns(32, 10)
    write_xlsx(str(root / "slides_data_TCGA.xlsx"), pd.DataFrame({
        "file": files, "id": ["TCGA"] * 6,
        "patient barcode": [f"P{i}" for i in range(6)],
        "ER status": targets, "test fold idx": folds,
        "Manipulated Objective Power": [10] * 6, "DX": [True] * 6,
    }))
    write_xlsx(str(root / "Grids_10" / "Grid_data.xlsx"), pd.DataFrame(
        {"file": files, total_col: counts, legit_col: counts}))
    return tmp_path


def test_ssl_to_features_to_mil_chain(cohort, tmp_path):
    # --- 1. tiny DINO SSL pretrain on tiles from the cohort ---
    cfg = dataclasses.replace(
        vit_tiny(num_classes=0, img_size=32, use_pallas_attention=False,
                 dtype=jnp.float32),
        depth=2, embed_dim=32, num_heads=2,
    )
    model = DINOModel(
        backbone=VisionTransformer(cfg),
        head=DINOHead(out_dim=64, hidden_dim=32, bottleneck_dim=16),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    dcfg = DINOConfig(out_dim=64, n_local=2, total_steps=6)
    tx, _ = make_optimizer(OptimConfig(opt="adamw", lr=1e-4), params, 4)
    state = create_dino_state(params, tx, dcfg)
    mc = make_multicrop(MultiCropConfig(global_size=32, local_size=16, n_local=2))
    step = jax.jit(make_dino_train_step(model.apply, tx, dcfg, multicrop_fn=mc))

    table = load_slide_table(
        "TCGA", tile_size=32, target_kind="ER", train_type="Infer",
        infer_folds=[1], data_root=str(cohort),
    )
    from tpuwsi.io.wsi import WSITileSampler

    train_table = table  # single fold; SSL uses all
    sampler = WSITileSampler(train_table, n_tiles=2, bag_size=1)
    rng_np = np.random.default_rng(0)
    losses = []
    for batch in sampler.batches(rng_np, 4):
        state, m = step(state, {"images": jnp.asarray(batch["images"])},
                        jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))

    # --- 2. feature extraction over slides (padded walker + backbone) ---
    backbone = VisionTransformer(cfg)
    bb_params = {"params": state.teacher_params["params"]["backbone"]}
    norm = make_recipe("none", train=False, tile_size=32)

    @jax.jit
    def feat_fn(images):
        x = norm(jax.random.PRNGKey(0), images)
        return backbone.apply(bb_params, x)

    walker = SlideWalker(table, tiles_per_iter=8, num_tiles=10)
    agg = SlideAggregator(extract_features=True)
    for chunk in walker.walk():
        feats = np.asarray(feat_fn(jnp.asarray(chunk.images)))
        probs = np.stack([1 - chunk.mask, chunk.mask], axis=1).astype(float)
        agg.add_chunk(chunk, probs, feats)
    assert len(agg.results) == 6
    assert agg.results[0].features.shape == (10, 32)

    # --- 3. kNN probe on the SSL features separates the classes ---
    feats = np.concatenate([r.features for r in agg.results])
    labels = np.concatenate(
        [np.full(len(r.tile_probs), r.label) for r in agg.results]
    )
    acc = knn_accuracy(
        jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(feats), jnp.asarray(labels), k=5,
    )
    assert acc > 0.9  # classes are trivially separable by brightness

    # --- 4. reference-format export → MIL head training ---
    data_file = str(tmp_path / "inference.data")
    agg.save_inference_data(data_file)
    ds = FeaturesMILDataset(data_file, bag_size=8, minimum_tiles_in_slide=2,
                            is_train=True)
    logs = []
    train_mil_head(ds, epochs=40, batch_size=6, lr=5e-3,
                   log_fn=lambda e, m: logs.append(m))
    assert logs[-1]["auc"] == 1.0


def test_knn_multiclass_not_clamped():
    """knn_classify/knn_accuracy must honor >2-class label spaces: the old
    num_classes=2 default one-hotted labels >=2 to zero vectors, clamping
    every multi-class probe to a 2-class argmax (max accuracy 2/C) — found
    when the 8-class SSL-slice probe pinned at exactly 0.25."""
    import numpy as np

    from tpuwsi.ssl_dino.knn import knn_accuracy, knn_classify

    rng = np.random.default_rng(0)
    C, per = 8, 12
    # well-separated class clusters in feature space
    centers = rng.normal(size=(C, 32)) * 5
    tr_feats = np.concatenate(
        [centers[c] + rng.normal(size=(per, 32)) for c in range(C)])
    tr_labels = np.repeat(np.arange(C), per)
    te_feats = np.concatenate(
        [centers[c] + rng.normal(size=(4, 32)) for c in range(C)])
    te_labels = np.repeat(np.arange(C), 4)
    acc = knn_accuracy(jnp.asarray(tr_feats, jnp.float32),
                       jnp.asarray(tr_labels),
                       jnp.asarray(te_feats, jnp.float32),
                       jnp.asarray(te_labels), k=5)
    assert acc > 0.9, acc  # the clamped probe capped at 2/8 = 0.25
    preds, probs = knn_classify(
        jnp.asarray(tr_feats, jnp.float32), jnp.asarray(tr_labels),
        jnp.asarray(te_feats, jnp.float32), k=5)
    assert probs.shape == (C * 4, C)
    # explicit num_classes still honored (jit-able path)
    preds2, _ = knn_classify(
        jnp.asarray(tr_feats, jnp.float32), jnp.asarray(tr_labels),
        jnp.asarray(te_feats, jnp.float32), k=5, num_classes=C)
    assert (np.asarray(preds) == np.asarray(preds2)).all()
