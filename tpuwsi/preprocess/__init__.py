from tpuwsi.preprocess.normalize import MEAN, STD, MEAN_PIXEL, normalize, denormalize
from tpuwsi.preprocess.recipes import RECIPE_NAMES, make_recipe
from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop

__all__ = [
    "MEAN",
    "STD",
    "MEAN_PIXEL",
    "normalize",
    "denormalize",
    "RECIPE_NAMES",
    "make_recipe",
    "MultiCropConfig",
    "make_multicrop",
]
