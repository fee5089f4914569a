"""slides_data metadata maintenance utilities.

Parity: Dataset_Maker/dataset_utils.py:80-113 — timestamped backups of every
cohort's ``slides_data_<id>.xlsx``, merging a dataset group's metadata into
one frame, and unmerging an edited frame back out to the per-cohort files
(rows routed by the 'id' column). xlsx I/O goes through
``tpuwsi.utils.minixlsx`` with csv/parquet fallbacks like the rest of the
metadata layer.
"""

from __future__ import annotations

import datetime
import os
import shutil
from typing import Dict, Optional

import pandas as pd

from tpuwsi.io.cohorts import get_datasets_dir_dict

TIME_FORMAT = "%d%m%y_%H%M%S"  # dataset_utils.py:88 backup timestamp format


def _slides_data_path(cohort_dir: str, cohort_id: str) -> str:
    return os.path.join(cohort_dir, f"slides_data_{cohort_id}.xlsx")


def backup_dataset_metadata(metadata_file: str, extension: str,
                            now: Optional[datetime.datetime] = None) -> str:
    """Copy ``<file>.xlsx`` → ``<file><extension>_<timestamp>.xlsx``
    (dataset_utils.py:87-93). Returns the backup path."""
    timestamp = datetime.datetime.strftime(
        now or datetime.datetime.now(), TIME_FORMAT
    )
    base, ext = os.path.splitext(metadata_file)
    backup_file = f"{base}{extension}_{timestamp}{ext}"
    shutil.copyfile(metadata_file, backup_file)
    return backup_file


def backup_all_dataset_group_metadata(
    dataset_group: str, extension: str,
    dir_dict: Optional[Dict[str, str]] = None,
    data_root: Optional[str] = None,
) -> list:
    """Backup every cohort's slides_data file (dataset_utils.py:80-85)."""
    dir_dict = dir_dict or get_datasets_dir_dict(dataset_group,
                                                 data_root=data_root)
    return [
        backup_dataset_metadata(_slides_data_path(d, cid), extension)
        for cid, d in dir_dict.items()
    ]


def merge_dataset_group_metadata(
    dataset_group: str,
    dir_dict: Optional[Dict[str, str]] = None,
    data_root: Optional[str] = None,
) -> pd.DataFrame:
    """Concatenate every cohort's slides_data into one frame
    (dataset_utils.py:96-104)."""
    from tpuwsi.utils.minixlsx import read_table

    dir_dict = dir_dict or get_datasets_dir_dict(dataset_group,
                                                 data_root=data_root)
    frames = [
        read_table(_slides_data_path(d, cid)) for cid, d in dir_dict.items()
    ]
    return pd.concat(frames, ignore_index=True)


def unmerge_dataset_group_metadata(
    slides_data: pd.DataFrame,
    dataset_group: str,
    dir_dict: Optional[Dict[str, str]] = None,
    data_root: Optional[str] = None,
) -> None:
    """Write an edited merged frame back to the per-cohort files, routing
    rows by 'id' (dataset_utils.py:107-112)."""
    from tpuwsi.utils.minixlsx import write_xlsx

    dir_dict = dir_dict or get_datasets_dir_dict(dataset_group,
                                                 data_root=data_root)
    for cid, d in dir_dict.items():
        rows = slides_data[slides_data["id"] == cid]
        if rows.empty:
            # an 'id' edit/typo that matches zero rows would otherwise
            # TRUNCATE that cohort's slides_data file to a header-only table
            raise ValueError(
                f"unmerge: no rows with id == {cid!r} in the merged frame — "
                "refusing to overwrite its slides_data with an empty table"
            )
        write_xlsx(_slides_data_path(d, cid), rows.reset_index(drop=True))
