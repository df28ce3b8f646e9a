"""TPU-native inference/serving layer.

The reference has no serving story (its eval loops are entangled with the
trainers); this package provides one designed for TPU/XLA semantics:
fixed-shape bucketed batches (one compiled program per bucket — never a
per-request recompile), data-sharded execution over the local mesh,
micro-batching for concurrent request coalescing, and a stdlib HTTP
front-end with no extra dependencies.
"""

from .engine import InferenceEngine, MicroBatcher
from .loaders import (classifier_engine, detector_engine, embedding_engine,
                      segmenter_engine)
