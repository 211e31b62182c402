from .base import APWrapper, unwrapped
from .sparsify import Sparsify
from .time_limit import TimeLimit, TimeLimitState
