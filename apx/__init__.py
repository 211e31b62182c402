"""apx — a TPU-native active-perception environment engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
TimSchneider42/active-perception-gym (``ap_gym``): active-perception POMDP
environments where actions carry a prediction and the reward subtracts a
differentiable prediction loss. Environments are pure functions stepping
thousands of instances in lockstep under jit/vmap/shard_map, with datasets
resident in HBM and hot kernels (glimpse extraction, LIDAR raycasting)
implemented as MXU-friendly XLA programs and Pallas kernels.
"""

__version__ = "0.1.0"

from .core import (
    APEnv,
    APStepResult,
    AutoResetMode,
    VectorAPEnv,
    ActivePerceptionActionSpace,
    AffineLossFn,
    Box,
    CrossEntropyLossFn,
    DictSpace,
    Discrete,
    Image,
    LambdaLossFn,
    Logit,
    LossFn,
    MSELossFn,
    MultiDiscrete,
    Space,
    TupleSpace,
    WeightedLossFn,
    ZeroLossFn,
    batch_space,
    rollout,
    rollout_episodic,
    vmap_vector_env,
)
from .registry import env_ids, make, make_vec, registry
from .wrappers import APWrapper, Sparsify, TimeLimit, unwrapped
