from visitron_tpu.ops.attention import multi_head_attention
from visitron_tpu.ops.crossentropy import ce_supports, fused_masked_softmax_ce
from visitron_tpu.ops.layernorm import (fused_add_layernorm,
                                        layernorm_reference,
                                        layernorm_supports)
from visitron_tpu.ops.masking import length2mask, make_attention_bias

__all__ = ["multi_head_attention", "length2mask", "make_attention_bias",
           "fused_add_layernorm", "layernorm_reference",
           "layernorm_supports", "fused_masked_softmax_ce", "ce_supports"]
