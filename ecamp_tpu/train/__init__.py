from .optim import make_optimizer, make_schedule
from .state import TrainState
from .pretrain import PretrainTask
from .classification import ClassificationTask
from .segmentation import SegmentationTask
from .detection import DetectionTask
