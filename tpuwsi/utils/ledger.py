"""Experiment ledger.

Parity: utils.py:238-499 ``run_data`` — an xlsx-backed experiment registry:
create a new numbered experiment with a run directory, update fields (last
epoch, model, transformation string, dataset sizes, test AUC), and resume a
previous experiment by number. The reference guards the shared xlsx with an
ad-hoc retry loop (utils.py:320-336, SURVEY §5.2); here the source of truth
is an append-only JSONL (atomic appends, last-record-wins per experiment)
with an xlsx EXPORT for compatibility, eliminating the read-modify-write
race by construction.
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Dict, List, Optional

LEDGER_FIELDS_DEFAULTS = {
    "Test Fold": 1,
    "Transformations": "none",
    "Tile Size": 256,
    "Tiles Per Bag": 50,
    "MultiSlide Per Bag": False,
    "No. of Bags": 1,
    "DX": False,
    "DataSet": "TCGA",
    "Test Set (DataSet)": None,
    "Receptor": None,
    "Model": "None",
    "Last Epoch": 0,
    "Transformation String": "None",
    "Desired Slide Magnification": 10,
    "Per Patient Training": False,
    "Last Layer Freeze": False,
    "Repeating Data": False,
    "Data Limit": None,
    "Free Bias": False,
    "Carmel Only": False,
    "Using Feature from CAT model alone": False,
    "Remark": "",
    "Class Relation": None,
    "Learning Rate": -1,
    "Weight Decay": -1,
    "Censor Ratio": -1,
    "Combined Loss Weights": [],
    "Receptor + is_Tumor Train Mode": -1,
    "Trained with Domain Adaptation": False,
}


class ExperimentLedger:
    def __init__(self, runs_dir: str = "runs"):
        self.runs_dir = os.path.abspath(runs_dir)
        os.makedirs(self.runs_dir, exist_ok=True)
        self.path = os.path.join(self.runs_dir, "run_data.jsonl")

    # -- internals --------------------------------------------------------------
    def _append(self, record: Dict):
        line = json.dumps(record, default=str)
        with open(self.path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    def _records(self) -> List[Dict]:
        if not os.path.isfile(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(l) for l in f if l.strip()]

    def _state(self) -> Dict[int, Dict]:
        state: Dict[int, Dict] = {}
        for rec in self._records():
            exp = int(rec["Experiment"])
            state.setdefault(exp, {}).update(rec)
        return state

    # -- API (run_data parity) ----------------------------------------------------
    def create(self, receptor: str, test_fold=1, name=None, subname=None,
               **fields) -> Dict:
        """``name`` (--experiment) overrides the run-folder stem, timm's
        exp_name semantics (timm_train.py output dir naming); the Receptor
        ledger column still records the target. ``subname``
        (--subexperiment) nests a sub-folder under the run dir, the
        reference's get_outdir(output, exp_name, subexp_name) layout
        (train.py:857-865)."""
        state = self._state()
        stem = name or receptor
        # id allocation via atomic mkdir of a per-id claim marker:
        # read-max+1 alone would race two concurrently started jobs into the
        # SAME experiment id (the append-only JSONL removes the update()
        # race, not this one) — os.makedirs(exist_ok=False) is the atomic
        # claim; on collision advance to the next id.
        experiment = max(state) + 1 if state else 1
        claims = os.path.join(self.runs_dir, ".exp_claims")
        os.makedirs(claims, exist_ok=True)
        while True:
            try:
                os.makedirs(os.path.join(claims, str(experiment)),
                            exist_ok=False)
                break
            except FileExistsError:
                experiment += 1
        location = os.path.join(
            self.runs_dir, f"Exp_{experiment}-{stem}-TestFold_{test_fold}"
        )
        if subname:
            location = os.path.join(location, subname)
        record = dict(LEDGER_FIELDS_DEFAULTS)
        record.update(
            {
                "Experiment": experiment,
                "Start Date": str(datetime.date.today()),
                "Test Fold": test_fold,
                "Receptor": receptor,
                "Location": location,
            }
        )
        record.update(fields)
        os.makedirs(location, exist_ok=True)
        self._append(record)
        return {"Location": location, "Experiment": experiment}

    def update(self, experiment: int, **fields):
        if int(experiment) not in self._state():
            raise KeyError(f"unknown experiment {experiment}")
        self._append({"Experiment": int(experiment), **fields})

    def resume(self, experiment: int) -> Dict:
        state = self._state()
        if int(experiment) not in state:
            raise KeyError(f"unknown experiment {experiment}")
        return state[int(experiment)]

    def all_experiments(self) -> Dict[int, Dict]:
        return self._state()

    def export_xlsx(self, path: Optional[str] = None) -> str:
        """run_data.xlsx-compatible export."""
        import pandas as pd

        from tpuwsi.utils.minixlsx import write_xlsx

        path = path or os.path.join(self.runs_dir, "run_data.xlsx")
        state = self._state()
        df = pd.DataFrame(
            [state[k] for k in sorted(state)],
        )
        write_xlsx(path, df)
        return path
