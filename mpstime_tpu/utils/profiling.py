"""Profiling / tracing hooks (SURVEY §5: the reference has only coarse
wall-clock logging; here training is annotated for xprof/perfetto).

Usage:

    from mpstime_tpu.utils.profiling import profile_trace
    with profile_trace("/tmp/mps_trace"):
        fit_mps(X, y, opts=opts)

then load the trace directory in TensorBoard's profile plugin or
ui.perfetto.dev.  The sweep kernels carry named scopes
("mps/backward_bond", "mps/forward_bond", "mps/build_envs", ...) so device
ops group by training phase.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a device trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.named_scope
