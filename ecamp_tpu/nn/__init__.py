from .pos_embed import get_2d_sincos_pos_embed, interpolate_pos_embed
from .vit import VisionTransformer, ViTClassifier, PatchEmbed, Block
from .bert import MultimodalBert, BertEmbeddings
from .mae import ECAMP
from .seg import SegViT, SegViTDual
from .det import ViTDetector, YoloV3Head, DetectionModel
