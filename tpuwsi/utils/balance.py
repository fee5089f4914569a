"""Patient-level dataset balancing.

Parity: utils.py:605-665 ``balance_dataset`` — ER branch: keep all Negative
patients, sample an equal number of Positive patients (patient = unique
'patient barcode'; per-patient status = first occurrence); censor branch
(survival) is implemented in tpuwsi.io.survival.load_survival_slide_table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def balance_dataset_er(
    meta_df: pd.DataFrame, rng: np.random.Generator | None = None
) -> pd.DataFrame:
    """Adds 'use_in_balanced_data_ER' ∈ {0,1} (utils.py:643-663)."""
    rng = rng or np.random.default_rng(2021)
    df = meta_df.copy()
    df["use_in_balanced_data_ER"] = 0
    df.loc[df["ER status"] == "Negative", "use_in_balanced_data_ER"] = 1

    barcodes = np.asarray(df["patient barcode"]).astype(str)
    patients, first_idx, inverse = np.unique(
        barcodes, return_index=True, return_inverse=True
    )
    status = np.asarray([df["ER status"].iloc[i] for i in first_idx])
    n_negative = int(np.sum(status == "Negative"))
    positive_patients = np.where(status == "Positive")[0]
    take = rng.choice(
        positive_patients,
        size=min(n_negative, len(positive_patients)),
        replace=False,
    )
    for p in take:
        df.loc[inverse == p, "use_in_balanced_data_ER"] = 1
    return df
