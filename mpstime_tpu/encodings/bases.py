"""Closed-form feature-map bases as pure JAX functions.

Each ``*_encode`` maps a scalar array ``x`` (any shape) to feature vectors of
shape ``x.shape + (d,)`` and is jit/vmap-safe (``d`` is static).  Math mirrors
the reference (MPSTime.jl src/Encodings/bases.jl): ``uniform_encode`` (:3-5),
``angle_encode`` (:8-20), ``fourier`` (:23-50), ``sahand`` (:53-74),
``legendre`` (:77-108) — but computed batched on device instead of per scalar.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _cis(theta: jnp.ndarray) -> jnp.ndarray:
    """e^{i theta} in explicit Euler form: ``lax.complex(cos, sin)``.

    Deliberately avoids ``jnp.exp(1j * theta)``: the ``1j`` literal becomes
    a complex scalar *constant* that eager dispatch must transfer to the
    device, and complex transfers are unimplemented on the axon TPU
    platform (utils/xfer.py).  The Euler form touches only real constants
    and is also how the hardware computes a complex exp anyway."""
    return jax.lax.complex(jnp.cos(theta), jnp.sin(theta))


def uniform_encode(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Constant 1/d features (reference bases.jl:3-5)."""
    return jnp.broadcast_to(jnp.full((d,), 1.0 / d, dtype=jnp.result_type(x)),
                            jnp.shape(x) + (d,))


def angle_encode(x: jnp.ndarray, d: int = 2, periods: float = 0.25) -> jnp.ndarray:
    """Stoudenmire spin-1/2 angle encoding, d=2 only (reference bases.jl:8-20).

    phi(x) = [e^{3 i pi x/2} cos(2 pi p x), e^{-3 i pi x/2} sin(2 pi p x)]
    """
    if d != 2:
        raise ValueError("Stoudenmire angle encoding only supports d = 2!")
    x = jnp.asarray(x)
    ph = _cis(1.5 * jnp.pi * x)
    s1 = ph * jnp.cos(2 * jnp.pi * periods * x)
    s2 = jnp.conj(ph) * jnp.sin(2 * jnp.pi * periods * x)
    return jnp.stack([s1, s2], axis=-1)


def get_fourier_freqs(d: int) -> np.ndarray:
    """Symmetric frequency selection [0, 1, -1, 2, -2, ...][:d]
    (reference bases.jl:27-34)."""
    hbound = int(math.ceil((d - 1.0) / 2.0))
    freqs = [0]
    for i in range(1, hbound + 1):
        freqs += [i, -i]
    return np.asarray(freqs[:d], dtype=np.float64)


def fourier_encode(x: jnp.ndarray, d: int,
                   freqs: Sequence[float] | None = None) -> jnp.ndarray:
    """phi_k(x) = e^{i pi f_k x} / sqrt(nds) (reference bases.jl:23-50).

    ``freqs`` overrides the default symmetric selection (used by the projected
    Fourier basis, where the normalisation stays 1/sqrt(len(freqs)))."""
    if freqs is None:
        freqs = get_fourier_freqs(d)
    nf = len(np.asarray(freqs))
    freqs = jnp.asarray(np.asarray(freqs))
    x = jnp.asarray(x)
    return _cis(jnp.pi * x[..., None] * freqs) / jnp.sqrt(float(nf))


def sahand_encode(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Piecewise-interval complex basis, even d (reference bases.jl:53-74)."""
    if d % 2 != 0:
        raise ValueError("Sahand encoding only supports even dimension")
    x = jnp.asarray(x)[..., None]
    i = np.arange(1, d + 1, dtype=np.float64)          # basis index
    dx = 2.0 / d
    interval = np.ceil(i / 2.0)
    startx = (interval - 1) * dx
    inside = (startx <= x) & (x <= interval * dx)
    odd = (i.astype(np.int64) % 2) == 1
    phase = _cis(jnp.pi * 1.5 * x / dx)
    arg = 0.5 * jnp.pi * (x - startx) / dx
    vals_odd = phase * jnp.cos(arg)
    vals_even = jnp.conj(phase) * jnp.sin(arg)
    vals = jnp.where(odd, vals_odd, vals_even)
    # mask by a REAL multiply — a complex-zero where-constant would need a
    # complex device constant (untransferable on axon, utils/xfer.py)
    return vals * inside.astype(vals.real.dtype)


def _legendre_norm_const(l: int) -> float:
    # normalised Legendre: Plnorm(x) = sqrt((2l+1)/2) * Pl(x), so ||Pl||_{L2[-1,1]} = 1
    return math.sqrt((2 * l + 1) / 2.0)


def legendre_stack(x: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Normalised Legendre polynomials P~_0..P~_lmax via the Bonnet recurrence,
    stacked on the last axis (shape x.shape + (lmax+1,))."""
    x = jnp.asarray(x)
    p_prev = jnp.ones_like(x)
    outs = [p_prev * _legendre_norm_const(0)]
    if lmax >= 1:
        p_cur = x
        outs.append(p_cur * _legendre_norm_const(1))
        for l in range(1, lmax):
            p_next = ((2 * l + 1) * x * p_cur - l * p_prev) / (l + 1)
            outs.append(p_next * _legendre_norm_const(l + 1))
            p_prev, p_cur = p_cur, p_next
    return jnp.stack(outs, axis=-1)


def legendre_encode(x: jnp.ndarray, d: int, norm: bool = False) -> jnp.ndarray:
    """First d normalised Legendre polynomials (reference bases.jl:77-108).

    With ``norm=True``, additionally divides by sqrt(P~_d(1) * d) so that
    |phi(x)|^2 <= 1 (reference bases.jl:86-89)."""
    ls = legendre_stack(x, d - 1)
    if norm:
        ls = ls / math.sqrt(_legendre_norm_const(d) * d)
    return ls


def polyval_matrix(x: jnp.ndarray, cvecs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the d polynomials rows of ``cvecs`` [d, d] (coefficients in
    increasing power order, reference bases.jl:115) at x -> x.shape + (d,)."""
    d = cvecs.shape[-1]
    powers = jnp.power(jnp.asarray(x)[..., None], jnp.arange(d, dtype=jnp.float64 if
                       jnp.asarray(x).dtype == jnp.float64 else jnp.float32))
    return jnp.einsum("...i,ni->...n", powers, cvecs)
