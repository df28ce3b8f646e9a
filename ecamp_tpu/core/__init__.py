from .config import (
    ViTConfig,
    BertConfig,
    PretrainConfig,
    ClassificationConfig,
    SegmentationConfig,
    DetectionConfig,
    OptimizerConfig,
    MeshConfig,
    DataConfig,
)
from .dtypes import DTypePolicy, DEFAULT_POLICY
from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch
from .metrics import SmoothedValue, MetricLogger
