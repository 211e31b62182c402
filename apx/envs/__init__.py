from .image_classification import ImageClassificationEnv
from .image_perception import (
    ImagePerceptionEngine,
    ImagePerceptionParams,
    ImagePerceptionState,
)
