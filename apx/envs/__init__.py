from .image_classification import ImageClassificationEnv
from .image_localization import ImageLocalizationEnv, ImageLocalizationState
from .image_perception import (
    ImagePerceptionEngine,
    ImagePerceptionParams,
    ImagePerceptionState,
)
from .lidar_localization import (
    LIDARLocalizationEnv,
    LIDARLocalizationParams,
    LIDARLocalizationState,
)
from .light_dark import LightDarkEnv, LightDarkParams, LightDarkState
