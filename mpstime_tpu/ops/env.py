"""Environment (prefix/suffix) caches for the DMRG sweep.

Replaces the reference's ``construct_caches``/``update_caches!``
(RealRealHighDimension.jl:45-144).  Layout is [T+1, N, chi] so that site
index is the leading axis (cheap dynamic updates inside the sweep loop):

  LE[t]   = contraction of sites 0..t-1 with conj(phi); LE[0]   = e0
  RE[t]   = contraction of sites t..T-1 with conj(phi); RE[T]   = e0

Each step is a batched [N,chi] x [chi,d,chi] x [N,d] contraction — two
matmuls on the MXU over the whole training set at once (the reference loops
over samples; here the sample axis is the batch axis and is the natural
data-parallel sharding axis).

Numerical scaling: raw prefix products decay/grow exponentially in T and
underflow even at f64 for ~100 sites (the reference sidesteps this only
because its per-sample loop divides one tiny number by another,
loss_functions.jl:203-262).  We store environments *normalized per sample*
with an accumulated log-scale [T+1, N].  The bond gradient is invariant to
these scales (both phi-tilde and yhat carry the same factor); the KLD loss
recovers the true magnitude as log|yhat_scaled|^2 + 2*logscale.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def boundary_env(N: int, chi: int, dtype) -> jnp.ndarray:
    return jnp.zeros((N, chi), dtype=dtype).at[:, 0].set(1.0)


def _normalize(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize [N, chi] rows; return (unit rows, log norms [N])."""
    nrm = jnp.linalg.norm(v, axis=1, keepdims=True)
    safe = jnp.where(nrm > 0, nrm, 1.0)
    return v / safe, jnp.log(safe[:, 0]).real


def env_step_left(v: jnp.ndarray, core: jnp.ndarray, phi_c: jnp.ndarray
                  ) -> jnp.ndarray:
    """v'[n,b] = sum_{a,i} v[n,a] conj(phi)[n,i] core[a,i,b]."""
    tmp = jnp.einsum("na,aib->nib", v, core)
    return jnp.einsum("nib,ni->nb", tmp, phi_c)


def env_step_right(v: jnp.ndarray, core: jnp.ndarray, phi_c: jnp.ndarray
                   ) -> jnp.ndarray:
    """v'[n,a] = sum_{i,b} core[a,i,b] conj(phi)[n,i] v[n,b]."""
    tmp = jnp.einsum("aib,nb->nai", core, v)
    return jnp.einsum("nai,ni->na", tmp, phi_c)


def env_step_left_scaled(v, ls, core, phi_c):
    v2, dls = _normalize(env_step_left(v, core, phi_c))
    return v2, ls + dls


def env_step_right_scaled(v, ls, core, phi_c):
    v2, dls = _normalize(env_step_right(v, core, phi_c))
    return v2, ls + dls


def build_left_envs(cores: jnp.ndarray, phis_c: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(LE [T+1, N, chi], logscale [T+1, N]); LE[0] = e0.

    Slots at/right of the orthogonality center are stale by construction —
    callers must only read valid slots."""
    T, chi = cores.shape[0], cores.shape[1]
    N = phis_c.shape[1]
    v0 = boundary_env(N, chi, cores.dtype)
    ls0 = jnp.zeros((N,), dtype=phis_c.real.dtype)

    def step(carry, xs):
        v, ls = carry
        core, ph = xs
        v2, ls2 = env_step_left_scaled(v, ls, core, ph)
        return (v2, ls2), (v2, ls2)

    _, (vs, lss) = jax.lax.scan(step, (v0, ls0), (cores, phis_c))
    LE = jnp.concatenate([v0[None], vs], axis=0)
    LS = jnp.concatenate([ls0[None], lss], axis=0)
    return LE, LS


def build_right_envs(cores: jnp.ndarray, phis_c: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(RE [T+1, N, chi], logscale [T+1, N]); RE[T] = e0, RE[t] uses cores[t]."""
    T, chi = cores.shape[0], cores.shape[1]
    N = phis_c.shape[1]
    v0 = boundary_env(N, chi, cores.dtype)
    ls0 = jnp.zeros((N,), dtype=phis_c.real.dtype)

    def step(carry, xs):
        v, ls = carry
        core, ph = xs
        v2, ls2 = env_step_right_scaled(v, ls, core, ph)
        return (v2, ls2), (v2, ls2)

    _, (vs, lss) = jax.lax.scan(step, (v0, ls0), (cores[::-1], phis_c[::-1]))
    RE = jnp.concatenate([vs[::-1], v0[None]], axis=0)
    LS = jnp.concatenate([lss[::-1], ls0[None]], axis=0)
    return RE, LS
