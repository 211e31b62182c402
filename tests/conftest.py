import os
import sys

# Force CPU with 8 virtual devices so multi-chip sharding tests run anywhere.
# The container's sitecustomize force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS, so we override back via jax.config (this also
# avoids the slow axon relay handshake at interpreter start).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite re-jits the same env graphs every
# run (and every xdist worker); cache hits skip XLA entirely. Keyed by HLO
# hash, so staleness is not a concern.
jax.config.update("jax_compilation_cache_dir", "/tmp/apx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = "/root/reference"


def load_reference_ap_gym():
    """Import the reference implementation for golden-parity tests.

    The container lacks shapely (used only by the reference's LIDAR env); a
    minimal stub lets the package import. Returns None if unavailable.
    """
    import importlib

    mod = sys.modules.get("ap_gym")
    if mod is not None and getattr(mod, "__apx_alias__", False):
        # The apx drop-in alias auto-installs under this name; parity
        # tests need the REAL reference — drop the alias and import it.
        del sys.modules["ap_gym"]
        mod = None
    if mod is None:
        # Evict alias submodules too — including orphans (the alias's
        # envs.* tree can outlive a popped top-level entry) — so a fresh
        # reference import doesn't resolve against stale alias modules.
        for k in [k for k in sys.modules if k.startswith("ap_gym.")]:
            del sys.modules[k]
    else:
        assert getattr(mod, "__file__", "") and "/root/reference" in mod.__file__, (
            "sys.modules['ap_gym'] is neither the reference nor the alias"
        )
        return mod
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "ap_gym")):
        return None
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import shapely  # noqa: F401
    except ImportError:
        # Install the pure-NumPy geometry shim (tests/shapely_shim.py) so
        # the reference's LIDAR env actually runs in-container and golden
        # LIDAR parity can be tested (see that module's docstring).
        import shapely_shim

        sys.modules["shapely"] = shapely_shim
    try:
        return importlib.import_module("ap_gym")
    except Exception:
        return None
