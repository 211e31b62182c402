"""Make ``import ap_gym`` resolve to the apx compat layer.

Lets scripts written against the reference (e.g. its example/*.py) run
unmodified on apx:

    import apx.compat.ap_gym_alias  # installs the alias
    import ap_gym
    env = ap_gym.make("CircleSquare-v0")

The alias exposes the reference's primary public surface: make/make_vec,
TimeLimit semantics are inside the registered envs, loss classes are the
apx ones behind the reference-shaped facade.
"""

from __future__ import annotations

import sys
import types


def install(name: str = "ap_gym") -> types.ModuleType:
    import apx.compat as apc
    from apx.core.losses import (
        AffineLossFn,
        CrossEntropyLossFn,
        LambdaLossFn,
        MSELossFn,
        WeightedLossFn,
        ZeroLossFn,
    )

    mod = types.ModuleType(name)
    mod.make = apc.make
    mod.make_vec = apc.make_vec
    mod.ensure_active_perception_env = apc.ensure_active_perception_env
    mod.ensure_active_perception_vector_env = (
        apc.ensure_active_perception_vector_env
    )
    mod.CrossEntropyLossFn = CrossEntropyLossFn
    mod.MSELossFn = MSELossFn
    mod.ZeroLossFn = ZeroLossFn
    mod.WeightedLossFn = WeightedLossFn
    mod.LambdaLossFn = LambdaLossFn
    mod.LossFnAffineTransformation = AffineLossFn
    sys.modules[name] = mod
    return mod


if "ap_gym" not in sys.modules:
    install()
