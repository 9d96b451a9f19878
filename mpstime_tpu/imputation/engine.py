"""Conditional-imputation engine: masked scans with trace-metric environments.

TPU-native redesign of the reference's imputation core
(src/Imputation/MPS_methods.jl + sampling_utils.jl).  The reference builds a
"conditioned" MPS over the missing sites (``precondition``, MPS_methods.jl:42-90),
orthogonalizes it, and walks it site by site computing single-site reduced
density matrices (``impute_at!``, :93-180).  Orthogonalization makes the right
tail an isometry so the RDM is a proper conditional marginal — but it depends
on the missing-site pattern, which would force a recompile per pattern.

Here the same math is expressed with static shapes and a mask:

 * Backward pass: PSD *trace-metric* environments R[t] [chi, chi]
     R[T]   = e0 e0^H
     known:   R[t] = w_t R[t+1] w_t^H,  w_t = sum_i conj(phi_t)_i W[t][:,i,:]
     missing: R[t] = sum_i W[t][:,i,:] R[t+1] W[t][:,i,:]^H
   (tracing a missing site over the orthonormal site basis is exactly what the
   reference's right-orthogonalization does implicitly).
 * Forward pass: carry v [chi] (the conditioned left environment).  At a known
   site, contract the known state.  At a missing site,
     A[i,b] = sum_a v[a] W[t][a,i,b]
     rdm[i,j] = sum_{b,c} A[i,b] R[t+1][b,c] conj(A[j,c])
     p(x) = conj(phi(x))^T rdm phi(x)   evaluated on the whole guess grid as
   one [G,d] x [d,d] matmul (the reference's per-x loop, sampling_utils.jl:19-52),
   then the estimator (median/mean/mode/ITS, sampling_utils.jl:64-316) picks
   x*, the chosen state is projected into v, and the scan continues.

One jit serves every missing pattern of a given length-T problem; the scan is
vmappable over instances and classes.  Environments are renormalized per step
(scale-invariant: every estimator normalizes by the grid partition function Z).

Everything per-MODEL (MPS cores, guess grid + its encodings, the encoding's
``enc_args``) is a traced *argument*, and built kernels are cached at module
level keyed only on the static geometry/config — so hyperopt trial loops
(a fresh trained MPS per trial, same geometry) reuse ONE compiled program
instead of retracing and recompiling per trial.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ImputeResult(NamedTuple):
    x_samps: jnp.ndarray    # [T] imputed + known values (scaled units)
    errs: jnp.ndarray       # [T] error bars (0 at known sites)
    cdfs: jnp.ndarray       # [T, G] conditional cdfs (rows at known sites are 0)


def _cumtrapz(probs: jnp.ndarray, dx) -> jnp.ndarray:
    """Cumulative trapezoid with even spacing (NumericalIntegration
    TrapezoidalEvenFast, sampling_utils.jl:181)."""
    c = jnp.cumsum(probs)
    return dx * (c - 0.5 * probs - 0.5 * probs[0])


def _weighted_median_abs_dev(grid_x, probs, x0):
    """median(|x - x0|, weights=probs) (sampling_utils.jl:195)."""
    dev = jnp.abs(grid_x - x0)
    order = jnp.argsort(dev)
    w = probs[order]
    cw = jnp.cumsum(w)
    half = 0.5 * cw[-1]
    k = jnp.searchsorted(cw, half)
    return dev[order][jnp.minimum(k, dev.shape[0] - 1)]


_KERNEL_CACHE: dict = {}
_KERNEL_CACHE_MAX = 64   # FIFO-evicted; a compiled kernel (+ executables)
                         # is tens of MB, and an unpadded search over many
                         # (chi, d) shapes would otherwise grow unboundedly


def clear_kernel_cache():
    _KERNEL_CACHE.clear()


def make_impute_kernel(T: int, chi: int, d: int, G: int,
                       method: str = "median",
                       timedep: bool = False,
                       want_cdf: bool = False,
                       get_err: bool = True,
                       max_jump: Optional[float] = None,
                       rejection_threshold: Optional[float] = None,
                       max_trials: int = 10,
                       encode_batch: Optional[Callable] = None,
                       enc_key=None,
                       reverse_t: bool = False,
                       variant: str = "single",
                       enc_d: Optional[int] = None):
    """Build (or fetch from the module cache) a jitted imputation kernel for
    one (T, chi, d, G) problem geometry.

    ``encode_batch(X, d, enc_args) -> [..., d]`` is the encoding's
    jax-traceable batch evaluator (needed by the :mean estimator,
    sampling_utils.jl:87, and by the 'windows' variant's in-jit target
    encoding); ``enc_key`` is a hashable identity for it — kernels that need
    ``encode_batch`` are module-cached only when ``enc_key`` is given.
    ``reverse_t``: evaluate a time-dependent encoding at original site
    T-1-t (impute_order='backwards' on reversed cores).

    variant:
      'single'  — kernel(cores [T,chi,d,chi], phis_c [T,d], known_mask [T],
                  known_x [T], x_prev0, key) -> ImputeResult
      'batch'   — instance-vmapped: (cores, phis_c [B,T,d], known_mask [T],
                  known_x [B,T], x_prev0 [B], keys [B,2]) -> ImputeResult[B]
      'windows' — lax.map over W window patterns of the batch kernel with the
                  target encoding computed in-jit: (cores, scaled [W,B,T],
                  known [W,T], x_prev0 [W,B], keys [W,B,2]) -> x_samps [W,B,T]

    All variants are partially bound by the caller with the per-problem
    (grid_x, dx, grid_states, enc_args) leading arguments.
    """
    needs_encode = (method == "mean") or (variant == "windows")
    if needs_encode and encode_batch is None:
        raise ValueError(f"method={method!r}/variant={variant!r} requires "
                         "a jax-traceable encode_batch")
    cacheable = (not needs_encode) or (enc_key is not None)
    if enc_d is None:
        enc_d = d
    cache_key = (T, chi, d, G, method, timedep, want_cdf, get_err, max_jump,
                 rejection_threshold, max_trials, enc_key, reverse_t, variant,
                 enc_d)
    if cacheable and cache_key in _KERNEL_CACHE:
        return _KERNEL_CACHE[cache_key]

    def _pad_d(v):
        # shape-polymorphic path: the encoding produces enc_d features but
        # the model runs at padded d; padded directions are exact zeros
        if enc_d == d:
            return v
        return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, d - enc_d)])

    if timedep:
        def encode_at(x, t, enc_args, dtype):
            tt = (T - 1 - t) if reverse_t else t
            xx = jnp.zeros((1, T),
                           jnp.result_type(x, jnp.float32)).at[0, tt].set(x)
            return _pad_d(encode_batch(xx, enc_d, enc_args)[0, tt]).astype(dtype)
    else:
        def encode_at(x, t, enc_args, dtype):
            xx = jnp.reshape(x, (1, 1))
            return _pad_d(encode_batch(xx, enc_d, enc_args)[0, 0]).astype(dtype)

    def kernel(grid_x, dx, grid_states, enc_args, cores_full, phis_c,
               known_mask, known_x, x_prev0, key):
        """cores_full [T,chi,d,chi] (center folded in, normalized);
        phis_c [T,d] conj'd target states; known_mask [T] bool;
        known_x [T]; x_prev0: scalar (NaN if none); key: PRNG key."""
        dtype = cores_full.dtype
        rdtype = jnp.float32 if grid_states.real.dtype == jnp.float32 \
            else jnp.float64

        def site_states(t):
            return grid_states[t] if timedep else grid_states

        def estimator(rdm, S, x_prev, key_t):
            """Returns (x*, state* [d], err, cdf [G])."""
            Sc = jnp.conj(S)
            probs = jnp.real(jnp.einsum("gi,ij,gj->g", Sc, rdm, S))
            probs = jnp.maximum(probs, 0.0)
            cdf = _cumtrapz(probs, dx)
            Z = jnp.maximum(cdf[-1], jnp.finfo(rdtype).tiny)
            cdf_n = cdf / Z
            probs_n = probs / Z

            if method == "median":
                k = jnp.argmin(jnp.abs(cdf_n - 0.5))
                x_star = grid_x[k]
                state = S[k]
                err = _weighted_median_abs_dev(grid_x, probs_n, x_star) \
                    if get_err else 0.0
                return x_star, state, err, cdf_n

            if method == "mean":
                # rectangle-rule expectation over trapezoid Z
                # (sampling_utils.jl:86)
                x_star = jnp.sum(grid_x * probs) * dx / Z
                # placeholder state (nearest grid point); the scan body
                # replaces it with the exact encoding encode_at(x_star, t)
                state = S[jnp.argmin(jnp.abs(grid_x - x_star))]
                err = jnp.sqrt(jnp.sum((grid_x - x_star) ** 2 * probs)
                               * dx / Z) if get_err else 0.0
                return x_star, state, err, cdf_n

            if method == "mode":
                if max_jump is not None:
                    valid = jnp.abs(grid_x - x_prev) <= max_jump
                    has_prev = jnp.isfinite(x_prev)
                    masked = jnp.where(valid | ~has_prev, probs, -jnp.inf)
                    any_valid = jnp.any(valid) | ~has_prev
                    k = jnp.where(any_valid, jnp.argmax(masked),
                                  jnp.argmax(probs))
                else:
                    k = jnp.argmax(probs)
                return grid_x[k], S[k], jnp.asarray(0.0, rdtype), cdf_n

            if method == "its":
                if rejection_threshold is None:
                    u = jax.random.uniform(key_t, dtype=rdtype)
                    k = jnp.argmin(jnp.abs(cdf_n - u))
                    return grid_x[k], S[k], jnp.asarray(0.0, rdtype), cdf_n
                # rejection sampling within threshold*WMAD of the median
                kmed = jnp.argmin(jnp.abs(cdf_n - 0.5))
                med = grid_x[kmed]
                wmad = _weighted_median_abs_dev(grid_x, probs_n, med)

                def trial(carry, key_u):
                    k_acc, found = carry
                    u = jax.random.uniform(key_u, dtype=rdtype)
                    k_new = jnp.argmin(jnp.abs(cdf_n - u))
                    ok = jnp.abs(grid_x[k_new] - med) \
                        < rejection_threshold * wmad
                    take = (~found)
                    k_acc = jnp.where(take, k_new, k_acc)
                    found = found | ok
                    return (k_acc, found), None

                keys_t = jax.random.split(key_t, max_trials)
                (k, _), _ = jax.lax.scan(trial, (kmed, jnp.asarray(False)),
                                         keys_t)
                return grid_x[k], S[k], wmad, cdf_n

            raise ValueError(f"unknown method {method!r}")

        # ---- backward trace-metric environments ----
        e0 = jnp.zeros((chi,), dtype).at[0].set(1.0)
        R_T = jnp.outer(e0, jnp.conj(e0))

        def back_step(Rnext, xs):
            W, ph, kn = xs
            w = jnp.einsum("aib,i->ab", W, ph)
            Rk = w @ Rnext @ w.conj().T
            Rm = jnp.einsum("aib,bd,cid->ac", W, Rnext, jnp.conj(W))
            R = jnp.where(kn, Rk, Rm)
            tr = jnp.maximum(jnp.real(jnp.trace(R)), jnp.finfo(rdtype).tiny)
            R = R / tr.astype(dtype)
            return R, R

        _, Rs_rev = jax.lax.scan(back_step, R_T,
                                 (cores_full[::-1], phis_c[::-1],
                                  known_mask[::-1]))
        # R_envs[t] = metric to the right of site t-1, i.e. R at slot t;
        # index [t+1] when at site t
        R_envs = jnp.concatenate([Rs_rev[::-1], R_T[None]], axis=0)

        v0 = e0
        keys = jax.random.split(key, T)

        def fwd_step(carry, t):
            v, x_prev = carry
            W = cores_full[t]
            kn = known_mask[t]

            def known_branch(_):
                v2 = jnp.einsum("a,aib,i->b", v, W, phis_c[t])
                zcdf = jnp.zeros((G,), rdtype)
                return v2, known_x[t].astype(rdtype), \
                    jnp.asarray(0.0, rdtype), zcdf, x_prev

            def missing_branch(_):
                A = jnp.einsum("a,aib->ib", v, W)
                rdm = jnp.einsum("ib,bc,jc->ij", A, R_envs[t + 1],
                                 jnp.conj(A))
                S = site_states(t)
                x_star, state, err, cdf = estimator(rdm, S, x_prev, keys[t])
                if method == "mean":
                    # exact encoding at the expectation (sampling_utils.jl:87)
                    state = encode_at(x_star, t, enc_args, dtype)
                v2 = jnp.einsum("ib,i->b", A, jnp.conj(state.astype(dtype)))
                cdf_out = cdf if want_cdf else jnp.zeros((G,), rdtype)
                return v2, x_star.astype(rdtype), \
                    jnp.asarray(err, rdtype), cdf_out, x_star.astype(rdtype)

            v2, x_t, err_t, cdf_t, x_prev2 = jax.lax.cond(
                kn, known_branch, missing_branch, None)
            nrm = jnp.linalg.norm(v2)
            v2 = v2 / jnp.maximum(nrm, jnp.finfo(rdtype).tiny).astype(dtype)
            return (v2, x_prev2), (x_t, err_t, cdf_t)

        (_, _), (xs, errs, cdfs) = jax.lax.scan(
            fwd_step, (v0, jnp.asarray(x_prev0, rdtype)), jnp.arange(T))
        return ImputeResult(xs, errs, cdfs)

    if variant == "single":
        fn = jax.jit(kernel)
    elif variant == "batch":
        fn = jax.jit(jax.vmap(
            kernel,
            in_axes=(None, None, None, None, None, 0, None, 0, 0, 0)))
    elif variant == "windows":
        # lax.map over windows (NOT a vmapped window axis): keeping each
        # window's mask unbatched preserves the per-site cond, so known
        # sites skip the guess-grid estimator.  Measured: flattening the
        # window axis into the batch (mask -> select, estimator at every
        # site) is ~6x SLOWER at dx=1e-4 — the [G]-length cumsum at all
        # T x W x B lanes is bandwidth-bound — while the mapped form's
        # cost is just W sequential scans.
        vkern = jax.vmap(
            kernel, in_axes=(None, None, None, None, None, 0, None, 0, 0, 0))

        def windows_fn(grid_x, dx, grid_states, enc_args, cores_full,
                       scaled, known, x_prev0, keys):
            cdtype = cores_full.dtype
            W_, B_, T_ = scaled.shape
            phis = _pad_d(jnp.asarray(
                encode_batch(scaled.reshape(W_ * B_, T_), enc_d, enc_args)))
            phis_c = jnp.conj(phis).astype(cdtype).reshape((W_, B_, T_, d))

            def body(xs):
                ph, km, sc, xp, ky = xs
                return vkern(grid_x, dx, grid_states, enc_args, cores_full,
                             ph, km, sc, xp, ky).x_samps

            return jax.lax.map(body, (phis_c, known, scaled, x_prev0, keys))

        fn = jax.jit(windows_fn)
    else:
        raise ValueError(f"unknown variant {variant!r}")

    if cacheable:
        while len(_KERNEL_CACHE) >= _KERNEL_CACHE_MAX:
            _KERNEL_CACHE.pop(next(iter(_KERNEL_CACHE)))
        _KERNEL_CACHE[cache_key] = fn
    return fn


def reverse_problem(cores_full: jnp.ndarray) -> jnp.ndarray:
    """Site-reversed MPS cores for impute_order='backwards': flip the site
    axis and swap each core's bond axes.  (The reference's :backwards path is
    broken by a NameError, MPS_methods.jl:163; here it is supported.)"""
    return jnp.transpose(cores_full[::-1], (0, 3, 2, 1))
