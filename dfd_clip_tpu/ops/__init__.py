from .attention import encoder_self_attention
from .decoder_attention import dual_activation_attention

__all__ = ["encoder_self_attention", "dual_activation_attention"]
