from .attention import dot_product_attention
from .layer_norm import fused_layer_norm
