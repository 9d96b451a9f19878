"""Complex-safe host<->device transfers.

The axon remote TPU platform supports complex64 *compute* fully (matmul,
QR, eigh, SVD all run on device) but cannot TRANSFER complex dtypes across
the host-device boundary — any host read or write of a complex array fails
with UNIMPLEMENTED (measured; see docs/tpu_performance.md).  These helpers
move complex arrays as real-imag pairs of the matching real dtype,
combining / splitting ON device; real dtypes and capable platforms pass
straight through to the plain transfer.

Used at every boundary crossing of the complex-encoding (fourier / sahand
/ stoudenmire) paths: MPS initialization, encoding pipelines, model
save/load, and result reads.  Reference complex-encoding surface:
/root/reference/src/Encodings/bases.jl:8-74, options.jl:117.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_device", "to_host", "zeros_on_device"]

# Platforms routed through the real-imag pair shim.  The axon remote TPU
# plugin registers its devices under the plain "tpu" platform name, so all
# TPU targets take the shim — on a TPU runtime with native complex
# transfer this merely costs one tiny combine/split jit, while on axon it
# is the only path that works.  A runtime capability PROBE is deliberately
# not attempted: on axon, one failed complex dispatch poisons the backend
# for the remainder of the process (every later device_put fails
# UNIMPLEMENTED, real or complex), so "try it and fall back" would break
# the very process it probes.  TPU runtimes with native complex transfer
# can skip the shim explicitly with MPSTIME_TPU_COMPLEX_XFER=native.
_NO_COMPLEX_XFER = () if __import__("os").environ.get(
    "MPSTIME_TPU_COMPLEX_XFER") == "native" else ("axon", "tpu")


@jax.jit
def _combine(r, i):
    return jax.lax.complex(r, i)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def _target_platform() -> str:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.default_backend()


def to_device(x, dtype=None) -> jnp.ndarray:
    """``jnp.asarray`` that ships complex arrays as on-device-combined
    real-imag pairs when the target platform cannot transfer complex."""
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        # already device-resident (dtype casts happen on device)
        return jnp.asarray(x, dtype=dtype)
    arr = np.asarray(x)
    target = np.dtype(dtype) if dtype is not None else arr.dtype
    if target.kind != "c" or _target_platform() not in _NO_COMPLEX_XFER:
        return jnp.asarray(x, dtype=dtype)
    arr = arr.astype(target)
    return _combine(jnp.asarray(np.ascontiguousarray(arr.real)),
                    jnp.asarray(np.ascontiguousarray(arr.imag)))


@jax.jit
def _zeros_like2(r):
    return jax.lax.complex(r, r)


def zeros_on_device(shape, dtype) -> jnp.ndarray:
    """``jnp.zeros`` that never materializes a complex host constant: an
    EAGER ``jnp.zeros(..., complex)`` broadcasts a complex scalar constant,
    whose device_put is unimplemented on axon — and one failed complex
    dispatch poisons the whole process.  Complex zeros are built on device
    from a real zeros buffer instead."""
    dt = np.dtype(dtype)
    if dt.kind != "c" or _target_platform() not in _NO_COMPLEX_XFER:
        return jnp.zeros(shape, dtype=dtype)
    rdt = np.zeros(0, dt).real.dtype
    return _zeros_like2(jnp.zeros(shape, rdt))


def to_host(x) -> np.ndarray:
    """``np.asarray`` that reads complex device arrays as real-imag pairs
    when the source platform cannot transfer complex."""
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer) \
            and np.dtype(x.dtype).kind == "c":
        try:
            plat = list(x.devices())[0].platform
        except Exception:                                     # noqa: BLE001
            plat = _target_platform()
        if plat in _NO_COMPLEX_XFER:
            r, i = _split(x)
            return np.asarray(r) + 1j * np.asarray(i)
    return np.asarray(x)
