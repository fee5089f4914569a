from tpuwsi.ops.attention import fused_attention, attention_reference

__all__ = ["fused_attention", "attention_reference"]
