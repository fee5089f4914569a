from tpuwsi.mil.features import (
    FeaturesMILDataset,
    load_inference_file,
    patient_of_slide,
)
from tpuwsi.mil.combined import CombinedFeaturesMILDataset
from tpuwsi.mil.locator import FeatureLocator
from tpuwsi.mil.train import (
    export_slide_scores_xlsx,
    make_mil_train_step,
    train_mil_head,
)

__all__ = [
    "FeaturesMILDataset",
    "load_inference_file",
    "patient_of_slide",
    "CombinedFeaturesMILDataset",
    "FeatureLocator",
    "export_slide_scores_xlsx",
    "make_mil_train_step",
    "train_mil_head",
]
