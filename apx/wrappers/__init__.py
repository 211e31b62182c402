from .base import APWrapper, unwrapped
from .sparsify import Sparsify
from .time_limit import TimeLimit, TimeLimitState
from .pseudo import PseudoActivePerceptionEnv
from .metrics import ClassificationMetrics, MetricsState, RegressionMetrics
from .vector_to_single import VectorToSingle
