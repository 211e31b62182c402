from .env import (
    APEnv,
    APStepResult,
    AutoResetMode,
    VectorAPEnv,
    rollout,
    rollout_episodic,
    vmap_vector_env,
)
from .losses import (
    AffineLossFn,
    CrossEntropyLossFn,
    LambdaLossFn,
    LossFn,
    MSELossFn,
    WeightedLossFn,
    ZeroLossFn,
)
from .spaces import (
    ActivePerceptionActionSpace,
    Box,
    DictSpace,
    Discrete,
    Image,
    Logit,
    MultiDiscrete,
    Space,
    TupleSpace,
    batch_space,
)
