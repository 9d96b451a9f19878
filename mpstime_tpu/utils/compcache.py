"""Lazy persistent-compilation-cache enablement.

TPU compiles go through a remote service with multi-second latency, and
hyperopt re-compiles per (chi, d) shape — caching executables on disk lets
repeat shapes (across trials AND processes) skip the service entirely.

CPU backends are excluded: XLA:CPU AOT executables embed host feature masks
that can differ between (sandboxed) processes on the same machine, and
reloading an executable across masks risks SIGILL.  CPU compiles are cheap
anyway.  The check runs at first *use* (not import), against the actual
default backend, so forcing CPU after import
(``jax.config.update("jax_platforms", "cpu")``) is honored.

Opt out entirely with ``MPSTIME_TPU_NO_COMPCACHE=1`` or by configuring
``jax_compilation_cache_dir`` yourself.
"""

from __future__ import annotations

import os

_checked = False


def maybe_enable_compilation_cache() -> None:
    """Idempotent; call before the first expensive jit compile."""
    global _checked
    if _checked or os.environ.get("MPSTIME_TPU_NO_COMPCACHE"):
        _checked = True
        return
    _checked = True
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return                         # user configured it themselves
        if jax.default_backend() == "cpu":
            return
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "mpstime_tpu", "jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
