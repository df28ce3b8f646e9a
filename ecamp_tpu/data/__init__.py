from .tokenizer import WordPieceTokenizer, Encoding
from .entity_masking import context_mask, template_weights, ENTITIES
from .transforms import (
    random_resized_crop,
    center_crop_resize,
    to_grayscale3,
    normalize,
    TrainTransform,
    EvalTransform,
)
from .datasets import (
    ClassificationListDataset,
    PretrainReportDataset,
    SIIMSegmentationDataset,
    RSNASegmentationDataset,
    RIGASegmentationDataset,
    RSNADetectionDataset,
)
from .loader import DataLoader
