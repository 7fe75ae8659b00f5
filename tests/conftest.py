"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first jax import anywhere in the test
process so sharding tests see 8 devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Single-core CI box: persistent compilation cache makes re-runs fast.
import jax  # noqa: E402

# sitecustomize may have imported jax at interpreter startup with the
# platform list pinned to the TPU plugin — the env var alone is then
# ignored; force the config in-process too.
jax.config.update("jax_platforms", "cpu")

from glorie_slam_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/root/repo")
