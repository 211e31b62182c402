"""Environment registry: the full ap_gym ID catalog, functional-style.

Behavioral reference: /root/reference/ap_gym/envs/registration.py:359-690.
Reproduces all 158 env IDs (79 base + 79 ``-sparse``; measured by importing
the reference and counting) with the same naming grammar:
  * 9 CircleSquare suffix families x {CircleSquare, CircleSquareInverted,
    DoubleCircleSquare} (:359-470),
  * CircleSquareHideAndSeek[NoPrediction]-v0 (:471-513),
  * MNIST / CIFAR10 / CIFAR10-c{2..10} / TinyImageNet (+Loc variants), each
    with ``-train``/``-test`` aliases (:195-228, :520-637),
  * LightDark-v0 with TimeLimit(50, issue_termination=True) (:640-647),
  * 4 LIDAR variants with TimeLimit(100, issue_termination=True) (:649-690),
  * every ID also as ``<Name>-sparse-v0`` via the Sparsify wrapper
    (:115-142).

API (functional, not gymnasium — see apx.compat for the gymnasium shim):
    env, params = apx.make("CircleSquare-v0")
    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=4096)
Datasets are loaded lazily at make() time and cached per configuration.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from .core.env import APEnv, AutoResetMode, VectorAPEnv, vmap_vector_env
from .envs.circle_square_hide_and_seek import CircleSquareHideAndSeek
from .envs.image_classification import ImageClassificationEnv
from .envs.image_localization import ImageLocalizationEnv
from .envs.lidar_localization import LIDARLocalizationEnv
from .envs.light_dark import LightDarkEnv
from .wrappers import Sparsify, TimeLimit
from .wrappers.metrics import ClassificationMetrics, RegressionMetrics
from .wrappers.vector_to_single import VectorToSingle

__all__ = ["EnvEntry", "registry", "make", "make_vec", "env_ids"]


@dataclasses.dataclass(frozen=True)
class EnvEntry:
    env_id: str
    build: Callable[[], APEnv]  # lazy env construction (loads datasets)
    step_limit: int  # episode length bound (metrics buffer size)
    metrics: str | None  # "classification" | "regression" | None
    autoreset: AutoResetMode
    description: str = ""
    vector_wrapper: Callable[[VectorAPEnv], Any] | None = None  # e.g. HideAndSeek
    sparse: bool = False


# registration.py:513-518: the HF image envs dim unvisited regions harder.
_RENDER_KW = dict(render_unvisited_opacity=0.5, render_visited_opacity=0.25)

_REGISTRY: dict[str, EnvEntry] | None = None
_BANK_CACHE: dict[Any, Any] = {}


def _circle_square_bank(size: int, gradient: bool):
    from .data.circle_square import make_circle_square_bank

    key = ("cs", size, gradient)
    if key not in _BANK_CACHE:
        _BANK_CACHE[key] = make_circle_square_bank((size, size), show_gradient=gradient)
    return _BANK_CACHE[key]


def _double_circle_square_ds(size: int, gradient: bool):
    from .data.circle_square import DoubleCircleSquareDataset

    key = ("dcs", size, gradient)
    if key not in _BANK_CACHE:
        _BANK_CACHE[key] = DoubleCircleSquareDataset.create(
            (size, size), show_gradient_a=gradient, show_gradient_b=gradient
        )
    return _BANK_CACHE[key]


def _hf_bank(name: str, split: str, channels=None, image_feature_name="image",
             filter_labels=None):
    from .data.huggingface import load_hf_image_bank

    key = ("hf", name, split, channels, tuple(filter_labels or ()))
    if key not in _BANK_CACHE:
        _BANK_CACHE[key] = load_hf_image_bank(
            name, split=split, channels=channels,
            image_feature_name=image_feature_name, filter_labels=filter_labels,
        )
    return _BANK_CACHE[key]


def _map_bank(kind: str, static: bool):
    from .data.floor_map import make_maze_bank, make_rooms_bank

    # Static variants use map index 0 like the reference's static_map_index=0
    # (lidar_localization2d.py:129, :177-178); dynamic variants draw from a
    # pre-generated bank (the reference generates per episode host-side).
    key = ("fm", kind, static)
    if key not in _BANK_CACHE:
        mk = make_maze_bank if kind == "maze" else make_rooms_bank
        if static:
            bank = mk(num_maps=1, indices=[0])
        else:
            bank = mk(num_maps=256)
        # NB: beam face tables (bank.with_beam_tables()) were measured
        # SLOWER than the dense slab scan in context (PERF.md round-2
        # study), so registered envs use plain banks.
        _BANK_CACHE[key] = bank
    return _BANK_CACHE[key]


def _register(reg: dict[str, EnvEntry], entry: EnvEntry):
    reg[entry.env_id] = entry
    base, ver = entry.env_id.rsplit("-", 1)
    reg[f"{base}-sparse-{ver}"] = dataclasses.replace(
        entry, env_id=f"{base}-sparse-{ver}", sparse=True
    )


def _build_registry() -> dict[str, EnvEntry]:
    reg: dict[str, EnvEntry] = {}
    LS = AutoResetMode.LOCKSTEP
    NS = AutoResetMode.NEXT_STEP

    # --- CircleSquare families (registration.py:359-470) ------------------
    cs_families = [
        ("", 28, True, 16),
        ("-s28", 28, True, 16),
        ("-s20", 20, True, 16),
        ("-s15", 15, True, 16),
        ("-nograd", 28, False, 16),
        ("-s20-nograd", 20, False, 16),
        ("-s15-nograd", 15, False, 16),
        ("-t32", 28, True, 32),
        ("-t64", 28, True, 64),
    ]
    for sfx, size, grad, t in cs_families:
        _register(reg, EnvEntry(
            env_id=f"CircleSquare{sfx}-v0",
            build=lambda size=size, grad=grad, t=t: ImageClassificationEnv(
                dataset=_circle_square_bank(size, grad), step_limit=t
            ),
            step_limit=t, metrics="classification", autoreset=LS,
            description="Classify whether the image contains a circle or a square.",
        ))
        _register(reg, EnvEntry(
            env_id=f"CircleSquareInverted{sfx}-v0",
            build=lambda size=size, grad=grad, t=t: ImageClassificationEnv(
                dataset=_circle_square_bank(size, grad), step_limit=t,
                randomly_invert_labels=True
            ),
            step_limit=t, metrics="classification", autoreset=LS,
            description="CircleSquare with per-episode random label inversion.",
        ))
        _register(reg, EnvEntry(
            env_id=f"DoubleCircleSquare{sfx}-v0",
            build=lambda size=size, grad=grad, t=t: ImageClassificationEnv(
                dataset=_double_circle_square_ds(size, grad), step_limit=t
            ),
            step_limit=t, metrics="classification", autoreset=LS,
            description="Two objects; classify two-squares / two-circles / mixed.",
        ))

    # --- HideAndSeek (registration.py:471-513) -----------------------------
    for env_id, mask in [
        ("CircleSquareHideAndSeek-v0", False),
        ("CircleSquareHideAndSeekNoPrediction-v0", True),
    ]:
        _register(reg, EnvEntry(
            env_id=env_id,
            build=lambda: ImageClassificationEnv(
                dataset=_circle_square_bank(28, True), step_limit=32
            ),
            step_limit=32, metrics="classification" if not mask else None,
            autoreset=LS,
            vector_wrapper=lambda v, mask=mask: CircleSquareHideAndSeek(
                v, mask_prediction=mask
            ),
            description="Extra reward for staying close to squares / far from circles.",
        ))

    # --- HF image datasets (registration.py:520-637) -----------------------
    hf_specs = [
        # name, hf dataset, kwargs for bank, env kwargs
        ("MNIST", dict(name="mnist", channels=1), {}),
        ("CIFAR10", dict(name="cifar10", image_feature_name="img"), _RENDER_KW),
        *[
            (f"CIFAR10-c{i}", dict(
                name="cifar10", image_feature_name="img",
                filter_labels=_cifar10_classes()[:i],
            ), _RENDER_KW)
            for i in range(2, 11)
        ],
        ("TinyImageNet", dict(name="zh-plus/tiny-imagenet"),
         dict(sensor_size=(10, 10), **_RENDER_KW)),
    ]
    for disp, bank_kw, env_kw in hf_specs:
        for split_sfx, split in [("", "train"), ("-train", "train"), ("-test", "test")]:
            real_split = split
            if bank_kw["name"] == "zh-plus/tiny-imagenet" and split == "test":
                real_split = "valid"
            _register(reg, EnvEntry(
                env_id=f"{disp}{split_sfx}-v0",
                build=lambda bank_kw=bank_kw, env_kw=env_kw, real_split=real_split:
                    ImageClassificationEnv(
                        dataset=_hf_bank(split=real_split, **bank_kw), **env_kw
                    ),
                step_limit=16, metrics="classification", autoreset=LS,
                description=f"Glimpse-based classification on {disp}.",
            ))

    loc_specs = [
        ("MNISTLoc", dict(name="mnist", channels=1), _RENDER_KW),
        ("CIFAR10Loc", dict(name="cifar10", image_feature_name="img"), _RENDER_KW),
        ("TinyImageNetLoc", dict(name="zh-plus/tiny-imagenet"),
         dict(sensor_size=(10, 10), **_RENDER_KW)),
    ]
    for disp, bank_kw, env_kw in loc_specs:
        for split_sfx, split in [("", "train"), ("-train", "train"), ("-test", "test")]:
            real_split = split
            if bank_kw["name"] == "zh-plus/tiny-imagenet" and split == "test":
                real_split = "valid"
            _register(reg, EnvEntry(
                env_id=f"{disp}{split_sfx}-v0",
                build=lambda bank_kw=bank_kw, env_kw=env_kw, real_split=real_split:
                    ImageLocalizationEnv(
                        dataset=_hf_bank(split=real_split, **bank_kw), **env_kw
                    ),
                step_limit=16, metrics="regression", autoreset=LS,
                description=f"Glimpse localization on {disp[:-3]}.",
            ))

    # --- LightDark (registration.py:640-647) -------------------------------
    _register(reg, EnvEntry(
        env_id="LightDark-v0",
        build=lambda: TimeLimit(LightDarkEnv(), 50, issue_termination=True),
        step_limit=50, metrics="regression", autoreset=NS,
        description="Noisy-observation position regression; noise shrinks near the light.",
    ))

    # --- LIDAR (registration.py:649-690) ------------------------------------
    for env_id, kind, static in [
        ("LIDARLocMazeStatic-v0", "maze", True),
        ("LIDARLocMaze-v0", "maze", False),
        ("LIDARLocRoomsStatic-v0", "rooms", True),
        ("LIDARLocRooms-v0", "rooms", False),
    ]:
        _register(reg, EnvEntry(
            env_id=env_id,
            build=lambda kind=kind, static=static: TimeLimit(
                LIDARLocalizationEnv(
                    map_bank=_map_bank(kind, static), static_map=static
                ),
                100, issue_termination=True,
            ),
            step_limit=100, metrics="regression", autoreset=NS,
            description=f"2D LIDAR self-localization on {kind} maps"
            + (" (static map)." if static else " (dynamic maps)."),
        ))

    return reg


def _cifar10_classes():
    from .data.huggingface import CIFAR10_CLASSES

    return list(CIFAR10_CLASSES)


def registry() -> dict[str, EnvEntry]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _build_registry()
    return _REGISTRY


def env_ids() -> list[str]:
    return sorted(registry().keys())


def _build_env(entry: EnvEntry) -> APEnv:
    env = entry.build()
    if entry.sparse:
        env = Sparsify(env)
    return env


def make(env_id: str, **param_overrides):
    """Single functional env: returns (env, params).

    For vector-wrapper envs (HideAndSeek) this returns a VectorToSingle
    adapter over a 1-env vector pipeline, mirroring the reference's
    construction (registration.py:482-489)."""
    entry = registry().get(env_id)
    if entry is None:
        raise KeyError(f"Unknown env id: {env_id!r}. Known: {len(registry())} ids.")
    if entry.vector_wrapper is not None:
        venv, params = make_vec(env_id, num_envs=1, **param_overrides)
        return VectorToSingle(venv), params
    env = _build_env(entry)
    return env, env.default_params(**param_overrides)


def make_vec(
    env_id: str,
    num_envs: int,
    metrics: bool = False,
    autoreset: AutoResetMode | None = None,
    **param_overrides,
):
    """Vectorized functional env: returns (venv, params)."""
    entry = registry().get(env_id)
    if entry is None:
        raise KeyError(f"Unknown env id: {env_id!r}. Known: {len(registry())} ids.")
    env = _build_env(entry)
    params = env.default_params(**param_overrides)
    venv = vmap_vector_env(env, num_envs, autoreset or entry.autoreset)
    out: Any = venv
    if entry.vector_wrapper is not None:
        out = entry.vector_wrapper(venv)
    if metrics and entry.metrics is not None:
        cls = ClassificationMetrics if entry.metrics == "classification" else RegressionMetrics
        out = cls(out, buffer_len=entry.step_limit)
    return out, params
