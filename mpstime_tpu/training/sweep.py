"""Jitted DMRG-style two-site sweep.

One full sweep (backward bond loop T-2..0, then forward 0..T-2, reference
RealRealHighDimension.jl:726-804) compiles to a single XLA computation:
``lax.fori_loop`` over bonds, with per-bond batched gradient einsums
(ops/bond_update.py), a truncated split (ops/decomp.py), and an
incremental environment update (one [N,chi] slot per bond, replacing the
reference's update_caches!, :107-144).  Environments are rebuilt between
half-sweeps exactly like the reference (:770, :804) for numerical hygiene,
and carry per-sample log-scales (see ops/env.py).

All shapes are static (chi = chi_max padding); sample count N is the
data-parallel axis.

``svd_alg="randomized_warm"`` threads per-bond subspace caches through the
sweep state: each bond's split warm-starts from the basis it found last
sweep (one power step per sweep, accumulating across sweeps), which removes
the per-bond Rayleigh-Ritz eigh from the critical path — the dominant cost
at chi >= 32 on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.bond_update import apply_update
from ..ops.decomp import (split_bond_left, split_bond_right, warm_sketch_init,
                          warm_split_left, warm_split_right)
from ..ops.env import (build_left_envs, build_right_envs,
                       env_step_left_scaled, env_step_right_scaled)


def init_subspaces(T: int, chi: int, d: int, dtype):
    """Cold-start per-bond subspace caches for svd_alg="randomized_warm".

    VB[j] [d*chi, chi]: right-subspace of backward bond j; UF[j] [chi*d, chi]:
    left-subspace of forward bond j (j = 0..T-2)."""
    v = warm_sketch_init(d * chi, chi, dtype)
    u = warm_sketch_init(chi * d, chi, dtype)
    VB = jnp.broadcast_to(v, (T - 1,) + v.shape)
    UF = jnp.broadcast_to(u, (T - 1,) + u.shape)
    return VB, UF


def _sweep_once(cores: jnp.ndarray, center: jnp.ndarray, phis_c: jnp.ndarray,
                y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
                eta, cutoff, *, loss: str, bbopt: str, update_iters: int,
                rescale: Tuple[bool, bool], svd_alg: str, subspaces=None):
    """Run one full (backward+forward) sweep.  center must be at site T-1 on
    entry; it is back at T-1 on exit.

    cores: [T, chi, d, chi]; center: [chi, d, chi, C];
    phis_c: [T, N, d] conj'd encoded train states; y_onehot: [N, C];
    class_weight: [N] per-sample loss weights.

    Returns (cores, center) — or (cores, center, subspaces) when
    ``svd_alg="randomized_warm"`` (subspaces from :func:`init_subspaces`).
    """
    T, chi, d, _ = cores.shape
    C = center.shape[3]
    N = phis_c.shape[1]
    dtype = cores.dtype
    rdtype = phis_c.real.dtype
    warm = svd_alg == "randomized_warm"
    if warm and subspaces is None:
        subspaces = init_subspaces(T, chi, d, dtype)
    VB, UF = subspaces if warm else (None, None)

    upd = partial(apply_update, eta=eta, loss=loss, bbopt=bbopt,
                  update_iters=update_iters, rescale=rescale)

    # ---------------- backward half-sweep (center T-1 -> 0) ----------------
    with jax.named_scope("mps/build_left_envs"):
        LE, LE_ls = build_left_envs(cores, phis_c)    # valid slots 0..T-1
    RE = jnp.zeros((T + 1, N, chi), dtype=dtype).at[T, :, 0].set(1.0)
    RE_ls = jnp.zeros((T + 1, N), dtype=rdtype)

    def backward_body(jj, state):
        with jax.named_scope("mps/backward_bond"):
            cores, center, RE, RE_ls, VB = state
            j = T - 2 - jj                             # left site of the bond
            A = cores[j]                               # [chi, d, chi]
            BT = jnp.einsum("aim,mkbc->aikbc", A, center)  # [chi,d,d,chi,C]
            _, BT = upd(BT, LE[j], RE[j + 2], phis_c[j].conj(),
                        phis_c[j + 1].conj(), y_onehot, class_weight,
                        LE_ls[j] + RE_ls[j + 2])
            # split: rows (a,i,c) keep the label on the sweep side (:166-169)
            M = BT.transpose(0, 1, 4, 2, 3).reshape(chi * d * C, d * chi)
            if warm:
                US, Vh, Qv = warm_split_left(M, VB[j], chi, cutoff)
                VB = VB.at[j].set(Qv)
            else:
                US, Vh = split_bond_left(M, chi, cutoff, svd_alg)
            center = US.reshape(chi, d, C, chi).transpose(0, 1, 3, 2)
            V = Vh.reshape(chi, d, chi)
            cores = cores.at[j + 1].set(V)
            v2, ls2 = env_step_right_scaled(RE[j + 2], RE_ls[j + 2], V,
                                            phis_c[j + 1])
            RE = RE.at[j + 1].set(v2)
            RE_ls = RE_ls.at[j + 1].set(ls2)
            return cores, center, RE, RE_ls, VB

    cores, center, RE, RE_ls, VB = jax.lax.fori_loop(
        0, T - 1, backward_body, (cores, center, RE, RE_ls, VB))

    # ---------------- forward half-sweep (center 0 -> T-1) -----------------
    with jax.named_scope("mps/build_right_envs"):
        RE, RE_ls = build_right_envs(cores, phis_c)   # valid slots 1..T
    LE2 = jnp.zeros((T + 1, N, chi), dtype=dtype).at[0, :, 0].set(1.0)
    LE2_ls = jnp.zeros((T + 1, N), dtype=rdtype)

    def forward_body(j, state):
        with jax.named_scope("mps/forward_bond"):
            cores, center, LE2, LE2_ls, UF = state
            B = cores[j + 1]
            BT = jnp.einsum("aimc,mkb->aikbc", center, B)
            _, BT = upd(BT, LE2[j], RE[j + 2], phis_c[j].conj(),
                        phis_c[j + 1].conj(), y_onehot, class_weight,
                        LE2_ls[j] + RE_ls[j + 2])
            M = BT.reshape(chi * d, d * chi * C)
            if warm:
                U, SVh, Qu = warm_split_right(M, UF[j], chi, cutoff)
                UF = UF.at[j].set(Qu)
            else:
                U, SVh = split_bond_right(M, chi, cutoff, svd_alg)
            Unew = U.reshape(chi, d, chi)
            center = SVh.reshape(chi, d, chi, C)
            cores = cores.at[j].set(Unew)
            v2, ls2 = env_step_left_scaled(LE2[j], LE2_ls[j], Unew, phis_c[j])
            LE2 = LE2.at[j + 1].set(v2)
            LE2_ls = LE2_ls.at[j + 1].set(ls2)
            return cores, center, LE2, LE2_ls, UF

    cores, center, _, _, UF = jax.lax.fori_loop(
        0, T - 1, forward_body, (cores, center, LE2, LE2_ls, UF))
    if warm:
        return cores, center, (VB, UF)
    return cores, center


@partial(jax.jit, static_argnames=("loss", "bbopt", "update_iters", "rescale",
                                   "svd_alg"))
def full_sweep(cores: jnp.ndarray, center: jnp.ndarray, phis_c: jnp.ndarray,
               y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
               eta, cutoff, *, loss: str, bbopt: str, update_iters: int,
               rescale: Tuple[bool, bool], svd_alg: str
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full sweep per device call (cores, center) -> (cores, center).

    With svd_alg="randomized_warm" the subspace caches are cold-started
    every call; use :func:`full_sweeps` to accumulate them across sweeps."""
    out = _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                      eta, cutoff, loss=loss, bbopt=bbopt,
                      update_iters=update_iters, rescale=rescale,
                      svd_alg=svd_alg)
    return out[0], out[1]


@partial(jax.jit, static_argnames=("loss", "bbopt", "update_iters", "rescale",
                                   "svd_alg"))
def full_sweep_warm(cores, center, subspaces, phis_c, y_onehot, class_weight,
                    eta, cutoff, *, loss: str, bbopt: str, update_iters: int,
                    rescale: Tuple[bool, bool], svd_alg: str):
    """One sweep with explicit warm-subspace state: pass the ``subspaces``
    returned by the previous call (init with :func:`init_subspaces`) so the
    caches accumulate across per-sweep host calls (fit_mps's logging path).
    Returns (cores, center, subspaces)."""
    return _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                       eta, cutoff, subspaces=subspaces, loss=loss,
                       bbopt=bbopt, update_iters=update_iters,
                       rescale=rescale, svd_alg=svd_alg)


@partial(jax.jit, static_argnames=("nsweeps", "loss", "bbopt", "update_iters",
                                   "rescale", "svd_alg"))
def full_sweeps(cores: jnp.ndarray, center: jnp.ndarray, phis_c: jnp.ndarray,
                y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
                eta, cutoff, *, nsweeps: int, loss: str, bbopt: str,
                update_iters: int, rescale: Tuple[bool, bool], svd_alg: str
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``nsweeps`` full sweeps in ONE compiled call.

    Host dispatch to the device costs 10-30 ms per call (remote TPU service);
    an on-device sweep at ECG200/chi=64 scale is ~50 ms, so per-sweep
    dispatch is pure overhead whenever per-sweep host-side logging is off
    (hyperopt always trains with log_level=-1).  The sweep body is traced
    once; XLA sees a fori_loop over identical iterations.

    With svd_alg="randomized_warm" the per-bond subspace caches persist
    across the fused sweeps (this is what makes the warm path converge)."""
    T, chi, d, _ = cores.shape
    warm = svd_alg == "randomized_warm"
    kw = dict(loss=loss, bbopt=bbopt, update_iters=update_iters,
              rescale=rescale, svd_alg=svd_alg)

    if warm:
        subspaces = init_subspaces(T, chi, d, cores.dtype)

        def body(_, state):
            cores, center, subspaces = state
            return _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                               eta, cutoff, subspaces=subspaces, **kw)

        cores, center, _ = jax.lax.fori_loop(
            0, nsweeps, body, (cores, center, subspaces))
        return cores, center

    def body(_, state):
        cores, center = state
        return _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                           eta, cutoff, **kw)

    return jax.lax.fori_loop(0, nsweeps, body, (cores, center))
