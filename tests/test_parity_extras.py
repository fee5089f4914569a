import os

import numpy as np
import pandas as pd
import pytest

from tpuwsi.io.concat import ConcatDataset
from tpuwsi.io.presaved import (
    read_presaved_tile,
    sample_presaved_tiles,
    tiles_dir_for_slide,
    write_presaved_tile,
)
from tpuwsi.utils.balance import balance_dataset_er
from tpuwsi.utils.gradflow import grad_flow_summary, render_grad_flow
from tpuwsi.utils.tracking import Tracker, pr_curve_points, roc_curve_points


def test_presaved_tile_roundtrip(tmp_path):
    tile = np.random.default_rng(0).integers(0, 255, (300, 300, 3), dtype=np.uint8)
    p = str(tmp_path / "tiles" / "slide_0" / "tile_0.data")
    write_presaved_tile(p, tile)
    back = read_presaved_tile(p)
    np.testing.assert_array_equal(tile, back)
    # reference header format: "<dtype> <w> <h> <c>\n" + raw
    with open(p, "rb") as f:
        header = f.readline().decode("ascii").strip().split()
    assert header == ["uint8", "300", "300", "3"]


def test_sample_presaved_tiles_crops(tmp_path):
    d = str(tmp_path / "tiles" / "s0")
    rng = np.random.default_rng(0)
    for i in range(5):
        write_presaved_tile(
            os.path.join(d, f"tile_{i}.data"),
            rng.integers(0, 255, (300, 300, 3), dtype=np.uint8),
        )
    out = sample_presaved_tiles(d, 5, 3, 256, rng)
    assert out.shape == (3, 256, 256, 3)
    assert out.std() > 0


def test_tiles_dir_for_slide():
    assert tiles_dir_for_slide("/data/ABCTB_TILES", "x.y.svs").endswith(
        "ABCTB_TILES/tiles/x.y"
    )


def test_balance_dataset_er():
    df = pd.DataFrame({
        "patient barcode": [f"P{i}" for i in range(10)],
        "ER status": ["Negative"] * 3 + ["Positive"] * 7,
    })
    out = balance_dataset_er(df, np.random.default_rng(0))
    sel = out[out["use_in_balanced_data_ER"] == 1]
    assert (sel["ER status"] == "Negative").sum() == 3
    assert (sel["ER status"] == "Positive").sum() == 3


def test_balanced_sampling_weights():
    from tpuwsi.io.metadata import SlideTable
    from tpuwsi.io.wsi import WSITileSampler

    table = SlideTable(
        dataset="TCGA", tile_size=32, desired_magnification=10,
        file_names=[f"s{i}" for i in range(10)],
        path_names=["/x"] * 10, cohort_ids=["TCGA"] * 10,
        folds=[2], tissue_tiles=[9] * 10,
        targets=["Positive"] * 1 + ["Negative"] * 9,
        magnifications=[10] * 10, patient_barcodes=[f"P{i}" for i in range(10)],
    )
    sampler = WSITileSampler(table, n_tiles=10, balanced_sampling=True)
    idx = sampler.epoch_indices(np.random.default_rng(0))
    labels = table.labels()[idx, 0]
    # minority class (Positive, 10% of slides) should be ~50% of draws
    assert 0.3 < labels.mean() < 0.7


def test_concat_dataset():
    class DS:
        def __init__(self, vals):
            self.vals = vals

        def __len__(self):
            return len(self.vals)

        def batches(self):
            yield from self.vals

    c = ConcatDataset(DS([1, 2]), DS([3]))
    assert len(c) == 3
    assert list(c.batches()) == [1, 2, 3]


def test_grad_flow_summary():
    import jax.numpy as jnp

    grads = {"layer1": {"kernel": jnp.ones((2, 2)) * 0.5},
             "layer2": {"kernel": jnp.ones((2, 2)) * 2.0}}
    s = grad_flow_summary(grads)
    assert len(s) == 2
    text = render_grad_flow({k: (float(v[0]), float(v[1])) for k, v in s.items()})
    assert "layer1" in text and "#" in text


def test_tracker_jsonl(tmp_path):
    t = Tracker(str(tmp_path))
    t.log({"loss": 0.5, "auc": np.float32(0.9)}, step=1)
    t.log_roc_pr([0.9, 0.1, 0.8, 0.2], [1, 0, 1, 0], prefix="eval_", step=2)
    import json

    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["loss"] == 0.5 and recs[0]["_step"] == 1
    assert len(recs[1]["eval_roc_points"]) > 0


def test_roc_pr_points_perfect_classifier():
    pts = roc_curve_points([0.9, 0.8, 0.1, 0.2], [1, 1, 0, 0], n=10)
    # perfect classifier passes through (0, 1)
    assert any(fpr == 0.0 and tpr == 1.0 for fpr, tpr in pts)
    pr = pr_curve_points([0.9, 0.8, 0.1, 0.2], [1, 1, 0, 0], n=10)
    assert any(p == 1.0 and r == 1.0 for r, p in pr)


def test_bootstrap_auc():
    from tpuwsi.infer.aggregate import SlideAggregator, SlideResult

    agg = SlideAggregator()
    rng = np.random.default_rng(0)
    for i in range(30):
        label = i % 2
        agg.results.append(SlideResult(
            slide_name=f"s{i}", slide_dataset="TCGA", patient_barcode=f"P{i}",
            label=label,
            tile_probs=np.asarray([0.8 if label else 0.2]) + rng.normal(0, 0.05, 1),
            tile_locations=[(0, 0)],
        ))
    mean, std = agg.bootstrap_slide_auc(n_boot=200)
    assert mean > 0.9
    assert 0.0 <= std < 0.2


def test_balanced_sampling_excludes_unknown_labels():
    """Reference train.py:719-731 initializes weights to zeros and only sets
    Positive/Negative entries — unknown (-1) slides are never sampled."""
    from tpuwsi.io.metadata import SlideTable
    from tpuwsi.io.wsi import WSITileSampler

    table = SlideTable(
        dataset="TCGA", tile_size=32, desired_magnification=10,
        file_names=[f"s{i}" for i in range(10)],
        path_names=["/x"] * 10, cohort_ids=["TCGA"] * 10,
        folds=[2], tissue_tiles=[9] * 10,
        targets=["Positive"] * 2 + ["Negative"] * 2 + ["Missing Data"] * 6,
        magnifications=[10] * 10, patient_barcodes=[f"P{i}" for i in range(10)],
    )
    sampler = WSITileSampler(table, n_tiles=10, balanced_sampling=True)
    idx = sampler.epoch_indices(np.random.default_rng(0))
    labels = table.labels()[idx, 0]
    assert (labels == -1).sum() == 0          # unknowns never drawn
    assert 0.3 < (labels == 1).mean() < 0.7   # remaining classes balanced


def test_save_inference_data_targets_distinct_from_labels(tmp_path):
    """Targets in the MIL pickle preserve -1 (unknown) independently of the
    eval label (reference 8-tuple, datasets.py:1048-1055 / :1195-1196)."""
    import pickle

    from tpuwsi.infer.aggregate import SlideAggregator, SlideResult

    agg = SlideAggregator()
    agg.results.append(SlideResult(
        slide_name="a.svs", slide_dataset="TCGA", patient_barcode="P0",
        label=1, target=-1,
        tile_probs=np.asarray([0.7]), tile_locations=[(0, 0)],
    ))
    agg.results.append(SlideResult(
        slide_name="b.svs", slide_dataset="TCGA", patient_barcode="P1",
        label=0,
        tile_probs=np.asarray([0.2]), tile_locations=[(0, 0)],
    ))
    path = str(tmp_path / "out.data")
    agg.save_inference_data(path)
    with open(path, "rb") as f:
        labels, targets, *_ = pickle.load(f)
    assert list(labels) == [1, 0]
    assert list(targets) == [-1, 0]  # -1 preserved; default falls back to label


def test_cox_breslow_ties_sort_order_invariant():
    """With tied event times the loss must not depend on argsort tie-breaking,
    and each event's risk set must include its ties (Breslow)."""
    import jax.numpy as jnp

    from tpuwsi.train.losses import cox_partial_likelihood

    risk = np.asarray([0.3, -0.8, 1.2, 0.1], dtype=np.float32)
    times = np.asarray([5.0, 5.0, 2.0, 7.0], dtype=np.float32)
    events = np.asarray([1.0, 1.0, 1.0, 0.0], dtype=np.float32)

    base = float(cox_partial_likelihood(jnp.asarray(risk), jnp.asarray(times),
                                        jnp.asarray(events)))
    for perm in ([1, 0, 2, 3], [3, 2, 1, 0], [2, 3, 0, 1]):
        p = np.asarray(perm)
        got = float(cox_partial_likelihood(
            jnp.asarray(risk[p]), jnp.asarray(times[p]), jnp.asarray(events[p])
        ))
        assert abs(got - base) < 1e-5

    # hand-computed Breslow: risk set of each t=5 event is {t=5, t=5, t=7}
    def lse(v):
        return float(np.log(np.sum(np.exp(np.asarray(v)))))

    expected = -(
        (0.3 - lse([0.3, -0.8, 0.1]))
        + (-0.8 - lse([0.3, -0.8, 0.1]))
        + (1.2 - lse([0.3, -0.8, 1.2, 0.1]))
    ) / 3.0
    assert abs(base - expected) < 1e-5
