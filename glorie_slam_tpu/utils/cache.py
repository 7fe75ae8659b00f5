"""Machine-keyed persistent XLA compilation cache directory.

The persistent cache stores AOT-compiled executables. CPU-backend entries
embed host ISA features (AVX-512 variants etc.); loading an entry compiled
on a different machine can SIGILL/segfault inside
``compilation_cache.get_executable_and_time`` (observed when this repo
moved hosts between build rounds: jax warns "Machine type used for XLA:CPU
compilation doesn't match the machine type for execution ... could lead to
execution errors such as SIGILL", then crashes). jax's own cache key does
not currently include the host fingerprint, so we namespace the cache
directory by one instead: ``<root>/.jax_cache/<fingerprint>``.

The fingerprint hashes the CPU flag set (/proc/cpuinfo), the platform
triple, and the jaxlib version — anything that changes the emitted code.
Stale sibling directories from other machines are left in place (cheap,
and a round-trip back to that machine stays warm).
"""

import hashlib
import os
import platform


def _machine_fingerprint() -> str:
    parts = [platform.machine(), platform.system()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:  # pragma: no cover - jaxlib is always present here
        parts.append("nojaxlib")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    # flag ORDER is stable per kernel; sort anyway
                    parts.append(" ".join(sorted(line.split(":")[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown-cpu")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def cache_dir(root: str = None) -> str:
    """Machine-scoped persistent-cache directory (created if missing).

    root: base directory (default: the repo root containing this package).
    """
    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(root, ".jax_cache", _machine_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def _cpu_only_platform() -> bool:
    """True when jax is pinned to the CPU backend (tests force this)."""
    import jax

    plats = None
    try:
        plats = jax.config.jax_platforms
    except AttributeError:  # very old jax
        pass
    if not plats:
        plats = os.environ.get("JAX_PLATFORMS", "")
    names = [p.strip().lower() for p in str(plats).split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)


def enable_persistent_cache(root: str = None) -> str:
    """Point jax at the machine-scoped cache with aggressive persistence.

    DISABLED on CPU-only runs: XLA:CPU AOT executable (de)serialization is
    unreliable on some hosts — both ``executable.serialize()`` and
    ``backend.deserialize_executable`` segfault for large programs on this
    machine's ISA (observed crashing the test suite at
    compilation_cache.py:238/265). TPU executables round-trip through the
    PJRT plugin's own path and are unaffected, and the cache's whole point
    here is amortizing the slow remote TPU compiles.
    """
    import jax

    if _cpu_only_platform():
        return None
    # platform unpinned: check the actual backend (initializes it — fine,
    # every caller touches devices right after)
    if jax.default_backend() == "cpu":
        return None
    d = cache_dir(root)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return d
