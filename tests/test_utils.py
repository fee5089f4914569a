import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuwsi.utils import ExperimentLedger, embed_squares, update_summary
from tpuwsi.utils.occlusion import occlusion_positions, occlusion_saliency


def test_ledger_create_update_resume(tmp_path):
    led = ExperimentLedger(str(tmp_path / "runs"))
    out = led.create("ER", test_fold=2, DataSet="CAT", Model="vit_small")
    assert out["Experiment"] == 1
    assert os.path.isdir(out["Location"])
    assert "Exp_1-ER-TestFold_2" in out["Location"]

    out2 = led.create("Her2")
    assert out2["Experiment"] == 2

    led.update(1, **{"Last Epoch": 17, "TestSet Mean AUC": 0.91})
    rec = led.resume(1)
    assert rec["Last Epoch"] == 17
    assert rec["TestSet Mean AUC"] == 0.91
    assert rec["Receptor"] == "ER"
    assert rec["DataSet"] == "CAT"

    with pytest.raises(KeyError):
        led.resume(99)

    # xlsx export round-trips through our reader
    from tpuwsi.utils.minixlsx import read_xlsx

    path = led.export_xlsx()
    df = read_xlsx(path)
    assert len(df) == 2
    assert int(df[df["Experiment"] == 1]["Last Epoch"].iloc[0]) == 17


def test_ledger_concurrent_appends(tmp_path):
    # append-only JSONL: interleaved updates never lose records
    led = ExperimentLedger(str(tmp_path / "runs"))
    led.create("ER")
    for i in range(20):
        led.update(1, **{"Last Epoch": i})
    assert led.resume(1)["Last Epoch"] == 19


def test_embed_squares_grid():
    img = jnp.zeros((64, 64, 3))
    variants = embed_squares(img, size=16, stride=8, color="Gray")
    assert variants.shape == (64, 64, 64, 3)  # (64/8)² positions
    # first variant: square at (0,0) filled with gray values
    v0 = np.asarray(variants[0])
    assert np.allclose(v0[0, 0], [-3.5712, -1.8690, -5.5611], atol=1e-4)
    assert np.allclose(v0[20, 20], 0.0)


def test_occlusion_saliency_localizes():
    # "model" scores class 1 by the value at pixel (32, 32): occluding there
    # should produce the max saliency drop.
    def apply_fn(params, images):
        v = images[:, 32, 32, 0]
        return jnp.stack([-v, v], axis=1) * 5
    img = jnp.zeros((64, 64, 3)).at[32, 32, 0].set(1.0)
    sal = occlusion_saliency(apply_fn, None, img, size=16, stride=8,
                             color="Black")
    sal = np.asarray(sal)
    r, c = np.unravel_index(sal.argmax(), sal.shape)
    # positions covering pixel 32: starts 24 or 32 → grid rows 3, 4
    assert r in (3, 4) and c in (3, 4)
    assert sal.max() > 0.5


def test_update_summary(tmp_path):
    f = str(tmp_path / "summary.csv")
    update_summary(0, {"loss": 1.0}, {"auc": 0.5}, f)
    update_summary(1, {"loss": 0.5}, {"auc": 0.8}, f)
    import csv

    rows = list(csv.DictReader(open(f)))
    assert len(rows) == 2
    assert float(rows[1]["eval_auc"]) == 0.8


def test_metadata_backup_merge_unmerge(tmp_path):
    """Dataset_Maker/dataset_utils.py:80-113 parity: timestamped backup,
    group merge, and id-routed unmerge of slides_data xlsx files."""
    import datetime

    import pandas as pd

    from tpuwsi.utils.metadata_tools import (
        backup_all_dataset_group_metadata,
        backup_dataset_metadata,
        merge_dataset_group_metadata,
        unmerge_dataset_group_metadata,
    )
    from tpuwsi.utils.minixlsx import read_table, write_xlsx

    dir_dict = {}
    for cid, n in (("TCGA", 3), ("CARMEL", 2)):
        d = tmp_path / cid
        os.makedirs(d)
        dir_dict[cid] = str(d)
        write_xlsx(
            str(d / f"slides_data_{cid}.xlsx"),
            pd.DataFrame({
                "file": [f"{cid.lower()}_{i}.svs" for i in range(n)],
                "id": [cid] * n,
                "ER status": ["Positive"] * n,
            }),
        )

    # backup: timestamped copies appear next to the originals
    backups = backup_all_dataset_group_metadata("CAT", "_bak", dir_dict=dir_dict)
    assert len(backups) == 2
    for b in backups:
        assert os.path.isfile(b) and "_bak_" in os.path.basename(b)
    b2 = backup_dataset_metadata(
        str(tmp_path / "TCGA" / "slides_data_TCGA.xlsx"), "_v1",
        now=datetime.datetime(2026, 8, 16, 12, 0, 0),
    )
    assert os.path.basename(b2) == "slides_data_TCGA_v1_160826_120000.xlsx"

    # merge: one frame with all rows
    merged = merge_dataset_group_metadata("CAT", dir_dict=dir_dict)
    assert len(merged) == 5 and set(merged["id"]) == {"TCGA", "CARMEL"}

    # edit + unmerge: rows route back by id
    merged.loc[merged["id"] == "CARMEL", "ER status"] = "Negative"
    unmerge_dataset_group_metadata(merged, "CAT", dir_dict=dir_dict)
    back = read_table(str(tmp_path / "CARMEL" / "slides_data_CARMEL.xlsx"))
    assert len(back) == 2 and (back["ER status"] == "Negative").all()
    back_t = read_table(str(tmp_path / "TCGA" / "slides_data_TCGA.xlsx"))
    assert (back_t["ER status"] == "Positive").all()


def test_dynamic_loss_scale_gradscaler_semantics():
    """Apex/GradScaler parity (train.py:586-602): backoff on non-finite,
    growth after the interval, step skipping."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuwsi.core.precision import DynamicLossScale, apply_if_finite

    ls = DynamicLossScale(growth_interval=2)
    assert float(ls.scale) == 2.0 ** 16

    grads = {"w": jnp.ones((3,)) * 2.0}
    scaled_loss = ls.scale_loss(jnp.float32(1.5))
    np.testing.assert_allclose(float(scaled_loss), 1.5 * 2 ** 16)
    un = ls.unscale(jax.tree_util.tree_map(lambda g: g * ls.scale, grads))
    np.testing.assert_allclose(np.asarray(un["w"]), 2.0, rtol=1e-6)

    # finite path: grows after growth_interval good steps
    finite = ls.grads_finite(grads)
    assert bool(finite)
    ls1 = ls.update(finite)
    ls2 = ls1.update(ls1.grads_finite(grads))
    assert float(ls2.scale) == 2.0 ** 17  # doubled after 2 good steps

    # non-finite path: halves scale, step skipped
    bad = {"w": jnp.array([1.0, np.inf, 2.0])}
    f = ls.grads_finite(bad)
    assert not bool(f)
    ls_bad = ls.update(f)
    assert float(ls_bad.scale) == 2.0 ** 15
    old = {"w": jnp.zeros((3,))}
    new = {"w": jnp.ones((3,))}
    kept = apply_if_finite(f, new, old)
    np.testing.assert_array_equal(np.asarray(kept["w"]), 0.0)

    # the whole thing jits (pure functional state)
    @jax.jit
    def step(ls, grads):
        f = ls.grads_finite(grads)
        return ls.update(f)

    out = step(ls, grads)
    assert float(out.scale) >= float(ls.scale)
