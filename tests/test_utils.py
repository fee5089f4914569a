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
