from tpuwsi.utils.labels import (
    COHORT_DICTIONARY,
    VALID_TARGETS,
    assert_dataset_target,
    cohort_to_int,
    get_label,
    num_2_bool,
)
from tpuwsi.utils.ledger import ExperimentLedger
from tpuwsi.utils.minixlsx import read_xlsx, write_xlsx
from tpuwsi.utils.occlusion import embed_squares, occlusion_saliency
from tpuwsi.utils.runlog import save_code_files, start_log, update_summary

__all__ = [
    "COHORT_DICTIONARY",
    "VALID_TARGETS",
    "assert_dataset_target",
    "cohort_to_int",
    "get_label",
    "num_2_bool",
    "ExperimentLedger",
    "read_xlsx",
    "write_xlsx",
    "embed_squares",
    "occlusion_saliency",
    "save_code_files",
    "start_log",
    "update_summary",
]
