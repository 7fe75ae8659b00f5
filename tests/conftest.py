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

import jax  # noqa: E402
import pytest  # noqa: E402

# sitecustomize may have imported jax at interpreter startup with the
# platform list pinned to the TPU plugin — the env var alone is then
# ignored; force the config in-process too.
jax.config.update("jax_platforms", "cpu")

# The persistent cache is intentionally NOT enabled here: XLA:CPU AOT
# executable (de)serialization segfaults for large programs on some hosts
# (see utils/cache.enable_persistent_cache, which refuses on CPU for the
# same reason). Tests compile fresh each run.
from glorie_slam_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/root/repo")  # no-op on the CPU platform


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Drop jit/executable caches after every test module.

    A full-suite run compiles hundreds of XLA:CPU programs in one process;
    on this host that accumulation has produced compiler segfaults deep
    into the run (backend_compile_and_load) that no module reproduces in
    isolation. Clearing per module bounds live-executable state at a small
    recompile cost for the few programs shared across modules.
    """
    yield
    jax.clear_caches()
