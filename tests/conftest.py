"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding (mesh/shard_map paths) is exercised without TPU hardware, per
SURVEY.md §4. Must run before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the host environment may pre-set JAX_PLATFORMS to a TPU plugin
# (e.g. 'axon'); tests must be deterministic and run the virtual 8-device
# mesh, and subprocess CLIs must inherit a working backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Belt-and-suspenders for every subprocess a test spawns: the ambient
# PYTHONPATH points at the host's TPU-tunnel sitecustomize hook
# (/root/.axon_site), whose interpreter-boot registration blocks for
# minutes when the tunnel is down — even with JAX_PLATFORMS=cpu. Repoint
# it at the repo so children import the package AND skip the hook, even
# if an individual test forgets to pass env= explicitly.
os.environ["PYTHONPATH"] = os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)

# The host image may install a TPU-tunnel PJRT plugin via a sitecustomize
# hook (PYTHONPATH=/root/.axon_site) that force-sets jax_platforms to the
# plugin at interpreter start, ignoring the env var. Override it back after
# import — config is re-read at first backend initialization. Subprocess CLI
# tests replace PYTHONPATH with the repo root, which also drops the hook.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (VERDICT r1
# weak #7 measured ~14 min cold). Warm runs reuse executables across
# processes and sessions, including the subprocess CLI tests (they inherit
# JAX_COMPILATION_CACHE_DIR via the environment).
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo_root, ".jax_cache")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
