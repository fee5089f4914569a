from tpuwsi.models.vit import (
    ViTConfig,
    VisionTransformer,
    vit_tiny,
    vit_small,
    vit_base,
    interpolate_pos_encoding,
)
from tpuwsi.models.dino_head import DINOHead, WeightNormDense
from tpuwsi.models.resnet_trunc import ResNetTruncBaseline, resnet50_trunc_baseline
from tpuwsi.models.mil import GatedAttentionMIL, MeanPoolMIL, tile_scores_from_head
from tpuwsi.models.registry import create_model, parse_model_name

__all__ = [
    "ViTConfig",
    "VisionTransformer",
    "vit_tiny",
    "vit_small",
    "vit_base",
    "interpolate_pos_encoding",
    "DINOHead",
    "WeightNormDense",
    "ResNetTruncBaseline",
    "resnet50_trunc_baseline",
    "GatedAttentionMIL",
    "MeanPoolMIL",
    "tile_scores_from_head",
    "create_model",
    "parse_model_name",
]
