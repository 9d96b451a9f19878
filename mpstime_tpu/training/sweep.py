"""Jitted DMRG-style two-site sweep.

One full sweep (backward bond loop T-2..0, then forward 0..T-2, reference
RealRealHighDimension.jl:726-804) compiles to a single XLA computation,
with per-bond batched gradient einsums (ops/bond_update.py), a truncated
split (ops/decomp.py), and incremental environment updates (replacing the
reference's construct_caches/update_caches!, :45-144).  Environments carry
per-sample log-scales (see ops/env.py).

TPU-critical structure decisions (measured on v5e, ECG200 chi=64):

 * Each half-sweep is a ``lax.scan``, NOT a fori_loop doing dynamic
   update-slices into carried buffers.  Within a half-sweep every read
   touches only the *pre-half-sweep* cores (backward reads site j while
   writing j+1 with j descending; forward reads j+1 while writing j with j
   ascending), so cores slices stream in as scan ``xs`` and new cores come
   out as stacked ``ys``.  The read-modify-write hazard of the fori+DUS
   form made XLA copy the full multi-MB buffers every bond (~73 us of a
   77 us bond); the scan form eliminates those copies.

 * Environment stacks are scan outputs too: the running [N, chi]
   environment is the scan carry, and its per-bond snapshots (ys) ARE the
   opposite-direction stack the next half-sweep consumes — which also makes
   the reference's between-half-sweep cache rebuilds (:770, :804)
   unnecessary: each half-sweep's emissions are already exact environments
   of the just-written cores, rooted at the boundary.

All shapes are static (chi = chi_max padding); sample count N is the
data-parallel axis.

``svd_alg="randomized_warm"`` threads per-bond subspace caches through the
sweep (scan xs in, ys out): each bond's split warm-starts from the basis it
found last sweep (one power step per sweep, accumulating across sweeps),
which removes the per-bond Rayleigh-Ritz eigh from the critical path.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pallas_bond, pallas_bond_c
from ..ops.bond_update import apply_update
from ..ops.decomp import (split_bond_left, split_bond_right,
                          warm_ritz_split_left, warm_ritz_split_right,
                          warm_sketch_init, warm_split_left,
                          warm_split_right)
from ..ops.env import (boundary_env, build_left_envs, env_step_left_scaled,
                       env_step_right_scaled)


WARM_ALGS = ("randomized_warm", "randomized_warm_ritz")
"""svd_algs that thread per-bond subspace caches through the sweep.
"randomized_warm_ritz" adds a per-bond [k, k] Rayleigh-Ritz rotation
(exact-SVD truncation ordering on the warm subspace — the large-chi
complex quality route, ops/decomp.warm_ritz_split_*).  Its EXACT
rotations (eigh / realified eigh) keep those sweeps on the XLA bond
path; the tracked sweeps fuse when the rotation is the matmul-only
jacobi tracker (K12cr, ops/pallas_bond_c.bond_step_c_ritz — r5)."""

BOND_BLOCK = None
"""Override for the multi-bond block size (K12m): None = auto (largest of
8/6/4/3/2 whose block footprint fits pallas_bond.BLOCK_MAX_FOOTPRINT),
1 = disable blocking (probe/debug knob — read at trace time, so changing
it requires a retrace).  The MPSTIME_TPU_BOND_BLOCK env var is an
equivalent per-process override (module state wins if both are set) —
the subprocess-friendly hatch for disabling the block route on a
platform where it misbehaves without demoting to XLA entirely."""


def _auto_block(C: int, chi: int, d: int, N: int, T: int,
                factor: int = 1, cap: int = 8) -> int:
    """Auto block size for the K12m route: largest Bb <= cap whose block
    footprint fits.  ``factor`` = 2 on the complex pair path (doubled
    operands), whose cap is also lower — the pair NS unroll is ~4x the
    instructions per power step and q defaults to 3, so the compile-size
    budget spends faster."""
    block = BOND_BLOCK
    if block is None:
        env = os.environ.get("MPSTIME_TPU_BOND_BLOCK")
        if env:
            block = int(env)
    if block is not None:
        return max(1, min(int(block), T - 1))
    for Bb in (8, 6, 4, 3, 2):
        if (Bb <= min(cap, T - 1)
                and factor * pallas_bond.block_footprint(C, chi, d, N, Bb)
                <= pallas_bond.BLOCK_MAX_FOOTPRINT):
            return Bb
    return 1


def _pallas_vmem_ok(C: int, chi: int, d: int, N: int,
                    factor: int = 1) -> bool:
    """Estimated VMEM footprint of the fused bond kernels vs what fits.
    Problems past Mosaic's ~16 MB default scoped budget compile with a
    raised per-kernel ``vmem_limit_bytes`` (pallas_bond._compiler_kw) up to
    the physical VMEM; measured on v5e at ECG200 shapes the fused path now
    runs chi=192 at 0.066 s/sweep and chi=256 at 0.095 (vs 0.095 / 0.158
    on the XLA fallback).  Past ~18 MB estimated residents the real path
    splits the warm power step into its own kernel (bond_step's
    ``split_tail`` route — the in-kernel tail crashes the Mosaic compiler
    there) and stays fused through ~30 MB estimated residents (measured:
    chi=320 at ECG shapes runs fused at 0.164 s/sweep; chi=384's compile
    exhausts the remote helper); anything larger falls back to the XLA
    bond step.  The COMPLEX pair kernels (factor=2)
    keep the 18 MB monolith ceiling: past it (fourier chi>=192 at ECG
    shapes) the full pair-kernel program exhausts the remote compile
    helper's memory even with the split-tail route and chained q=1 tail
    kernels (SIGKILL on a quiet machine — scripts/k1c_bisect.py,
    scripts/split_tail_c_probe.py), so complex large-chi takes the XLA
    bond path, which remains correct and close to fused throughput (r3
    measured fused within ~10% of XLA on the complex path)."""
    from ..ops.pallas_bond import (MAX_FOOTPRINT, SPLIT_MAX_FOOTPRINT,
                                   kernel_footprint)
    limit = MAX_FOOTPRINT if factor > 1 else SPLIT_MAX_FOOTPRINT
    return factor * kernel_footprint(C, chi, d, N) <= limit


def _pallas_eligible(dtype, loss, bbopt, update_iters, rescale, svd_alg,
                     platform: Optional[str] = None) -> bool:
    """The fused Pallas bond step covers the accelerator hot paths:
    real f32 with {KLD, MSE} x {TSGO, GD} (r5), or complex64 via the
    real-imag pair kernels (ops/pallas_bond_c.py — KLD + TSGO only);
    always one update iteration + post-normalization + warm splits, on a
    TPU platform (or in interpreter mode for tests).

    ``platform``: the platform the computation will actually PLACE on —
    callers that pin devices (fit_mps(mesh=...), DeviceFarm via
    jax.default_device) must pass it (see resolve_platform), because
    jax.default_backend() reports the process default, not the placement:
    e.g. tune(devices="cpu") on a TPU host pins jit to CPU devices while
    default_backend() still says tpu, and the Mosaic kernels cannot lower
    for CPU."""
    if platform == "xla":
        # explicit force-XLA sentinel (batched_full_sweeps: the model axis
        # rides every op via vmap, which the Mosaic kernels can't batch) —
        # checked before the interpret short-circuit on purpose
        return False
    if svd_alg != "randomized_warm":
        return False
    if int(update_iters) != 1:
        return False
    if tuple(rescale) != (False, True):
        return False
    if np.dtype(dtype) not in (np.dtype(np.float32),
                               np.dtype(np.complex64)):
        return False
    if np.dtype(dtype).kind == "c":
        if (loss, bbopt) != ("KLD", "TSGO"):
            return False
    elif loss not in ("KLD", "MSE") or bbopt not in ("TSGO", "GD"):
        return False
    if os.environ.get("MPSTIME_TPU_NO_PALLAS"):
        return False
    if pallas_bond._INTERPRET:
        return True
    if platform is None:
        platform = resolve_platform()
    return platform in ("tpu", "axon")


def pallas_route_notice(dtype, loss, bbopt, update_iters, rescale, svd_alg,
                        platform, C: int, chi: int, d: int, N: int,
                        track_cost: bool = False,
                        ritz_track_rot: str = "jacobi") -> Optional[str]:
    """One-line explanation of why a config will NOT run on the fused
    Pallas bond kernels (None if it will, or if the platform has no fused
    path to lose).  The eligibility set is narrow by design (the default
    hot path only — see ``_pallas_eligible``), and falling off it is a
    large perf cliff (order ~5-10x sweep time at chi>=64); fit_mps prints
    this at verbosity >= 1 so the demotion is never silent
    (docs/tpu_performance.md lists the full eligibility table)."""
    if pallas_bond._INTERPRET:
        return None
    plat = platform if platform is not None else resolve_platform()
    if plat not in ("tpu", "axon"):
        return None          # CPU / other: XLA bond path is the only path
    cplx = np.dtype(dtype).kind == "c"
    reasons = []
    if track_cost:
        reasons.append("track_cost=True (per-bond loss trace)")
    if os.environ.get("MPSTIME_TPU_NO_PALLAS"):
        reasons.append("MPSTIME_TPU_NO_PALLAS is set")
    if (svd_alg == "randomized_warm_ritz" and cplx
            and ritz_track_rot == "jacobi"):
        # the tracked sweeps of the complex ritz route DO run fused
        # (K12cr, ritz_rot_track="jacobi" — the accelerator default);
        # only the ritz_exact_sweeps exact-rotation sweeps take XLA
        pass
    elif svd_alg == "randomized_warm_ritz" and cplx:
        reasons.append(f"ritz_rot_track={ritz_track_rot!r} (the ritz "
                       "route's tracked sweeps fuse only with the "
                       "matmul-only 'jacobi' tracker)")
    elif svd_alg != "randomized_warm":
        reasons.append(f"svd_alg={svd_alg!r} (fused path requires "
                       "'randomized_warm', or 'randomized_warm_ritz' "
                       "on complex dtypes whose TRACKED sweeps fuse via "
                       "the jacobi rotation; note complex chi_max > "
                       f"{_complex_ritz_gate()} auto-resolves to "
                       "'randomized_warm_ritz' for accuracy)")
    if int(update_iters) != 1:
        reasons.append(f"update_iters={update_iters} (fused path covers "
                       "a single update iteration)")
    if cplx and (loss, bbopt) != ("KLD", "TSGO"):
        reasons.append(f"loss={loss}/bbopt={bbopt} (the complex pair "
                       "kernels cover KLD+TSGO only)")
    if not cplx and (loss not in ("KLD", "MSE")
                     or bbopt not in ("TSGO", "GD")):
        reasons.append(f"loss={loss}/bbopt={bbopt} (fused path covers "
                       "{KLD, MSE} x {TSGO, GD})")
    if tuple(rescale) != (False, True):
        reasons.append(f"rescale={tuple(rescale)} (fused path covers "
                       "(False, True))")
    if not cplx and np.dtype(dtype) != np.dtype(np.float32):
        reasons.append(f"dtype={np.dtype(dtype).name} (fused path is "
                       "f32/c64)")
    if cplx and np.dtype(dtype) != np.dtype(np.complex64):
        reasons.append(f"dtype={np.dtype(dtype).name} (fused path is "
                       "f32/c64)")
    if (not reasons and not _pallas_vmem_ok(C, chi, d, N,
                                            factor=2 if cplx else 1)
            and pallas_bond.stream_tile_for(C, chi, d, N,
                                            factor=2 if cplx else 1)
            is None):
        # batch-driven overflows stream in tiles (stream_tile_for) and
        # stay fused; only chi-driven overflows demote
        reasons.append(f"estimated kernel footprint at chi={chi}, N={N} "
                       "exceeds the VMEM ceiling even per batch tile "
                       "(pallas_bond.kernel_footprint/stream_tile_for)")
    if not reasons:
        return None
    return ("[mpstime_tpu] note: this configuration takes the XLA bond "
            "path (not the fused Pallas kernels): " + "; ".join(reasons))


def _complex_ritz_gate() -> int:
    from ..options import COMPLEX_RITZ_CHI_GATE
    return COMPLEX_RITZ_CHI_GATE


def resolve_platform() -> str:
    """Platform jit-dispatched computations will place on: the thread-local
    ``jax.default_device`` override if set (what DeviceFarm uses to pin fold
    jobs), else the process default backend."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.default_backend()


def init_subspaces(T: int, chi: int, d: int, dtype):
    """Cold-start per-bond subspace caches for svd_alg="randomized_warm".

    VB[j] [d*chi, chi]: right-subspace of backward bond j; UF[j] [chi*d, chi]:
    left-subspace of forward bond j (j = 0..T-2)."""
    v = warm_sketch_init(d * chi, chi, dtype)
    u = warm_sketch_init(chi * d, chi, dtype)
    VB = jnp.broadcast_to(v, (T - 1,) + v.shape)
    UF = jnp.broadcast_to(u, (T - 1,) + u.shape)
    return VB, UF


def init_left_env_state(cores: jnp.ndarray, phis_c: jnp.ndarray):
    """(LE [T, N, chi], LE_ls [T, N]) for the first backward pass:
    LE[t] = contraction of sites 0..t-1 (LE[0] = boundary)."""
    LE, LE_ls = build_left_envs(cores, phis_c)
    return LE[:-1], LE_ls[:-1]


def _sweep_core(cores, center, LE, LE_ls, VB, UF, phis_c, y_onehot,
                class_weight, eta, cutoff, *, loss: str, bbopt: str,
                update_iters: int, rescale: Tuple[bool, bool], svd_alg: str,
                power_iters: int = 1, orth: str = "qr",
                refresh: bool = True, ritz_rot: str = "eigh",
                track_cost: bool = False,
                axis_name: Optional[str] = None,
                platform: Optional[str] = None,
                max_rank=None):
    """One full sweep; center at site T-1 on entry and exit.

    LE [T, N, chi] / LE_ls [T, N]: left environments of the current cores
    (slot t = sites 0..t-1).  Returns (cores, center, LE', LE_ls', VB', UF',
    costs) where LE' is produced by the forward half-sweep and is exactly
    what the next call needs.  VB/UF are the warm-split subspace caches
    (None unless svd_alg == "randomized_warm").  costs is the per-bond loss
    trace [2(T-1)] in update order (backward bonds T-2..0 then forward
    0..T-2) when ``track_cost`` (reference track_cost, options.jl:51 /
    loss_functions.jl:50), else None; tracking forces the XLA bond path.

    ``axis_name``: set when the sweep body runs inside shard_map over a
    data-parallel mesh — batch tensors (phis_c/y_onehot/class_weight and the
    environment state) are per-shard blocks and each bond update psums the
    local gradient over this axis (one collective per bond).

    ``ritz_rot``: eigen-rotation mode for svd_alg="randomized_warm_ritz" —
    "eigh" (exact, per-bond eigh) or "track" (eigh-free orthogonal-iteration tracking
    of the cached eigenbasis, ops/decomp._ritz_rot_track; only valid after
    at least one exact sweep has ordered the caches).
    """
    T, chi, d, _ = cores.shape
    C = center.shape[3]
    N = phis_c.shape[1]
    dtype = cores.dtype
    rdtype = phis_c.real.dtype
    warm = svd_alg in WARM_ALGS
    # module-global lookups so tests/probes can monkeypatch the split fns
    ritz = svd_alg == "randomized_warm_ritz"
    wsl = (partial(warm_ritz_split_left, rot=ritz_rot) if ritz
           else warm_split_left)
    wsr = (partial(warm_ritz_split_right, rot=ritz_rot) if ritz
           else warm_split_right)
    cplx = np.dtype(dtype).kind == "c"
    # Fused tracked-ritz route (K12cr): the adjacent-pair Jacobi rotation
    # is matmul-only, so complex ritz sweeps with ritz_rot="jacobi" run
    # the WHOLE bond step in one kernel (ops/pallas_bond_c.bond_step_c_
    # ritz — in-kernel NS refresh + in-kernel rotation + cutoff mask);
    # exact rotations (eigh/eigh_r) and the QR-based orth-iteration
    # tracker keep the XLA bond path.  Single-kernel range only: no
    # split-tail twin and no dp variant exist for K12cr.
    ritz_fused = (ritz and ritz_rot in ("jacobi", "jacobi_warm") and cplx
                  and axis_name is None
                  and 2 * pallas_bond.k12_footprint(C, chi, d, N)
                  <= pallas_bond.SPLIT_TAIL_FOOTPRINT)
    # N-streaming: when the full-N working set overflows the fused
    # kernels' VMEM range but the batch term is the driver, the bond step
    # runs the dp-split kernels over batch tiles instead of falling off
    # to XLA (pallas_bond._bond_step_streamed; production batches are
    # orders of magnitude larger than the UCR sets).  Not available for
    # the ritz kernel (single-kernel only) or under dp (shard wider).
    vmem_ok = _pallas_vmem_ok(C, chi, d, N, factor=2 if cplx else 1)
    stream = None
    if not vmem_ok and not ritz and axis_name is None:
        stream = pallas_bond.stream_tile_for(C, chi, d, N,
                                             factor=2 if cplx else 1)
    pallas = (not track_cost) \
        and (vmem_ok or stream is not None) \
        and _pallas_eligible(dtype, loss, bbopt, update_iters, rescale,
                             "randomized_warm" if ritz_fused else svd_alg,
                             platform=platform)
    ritz_fused = ritz_fused and pallas
    stream = stream if pallas else None
    cplx = cplx and pallas    # below, cplx means "complex pair kernels"
    if pallas and orth == "ns" and not ritz_fused and stream is None:
        est = pallas_bond.kernel_footprint(C, chi, d, N) * (2 if cplx else 1)
        if est > pallas_bond.SPLIT_TAIL_FOOTPRINT:
            # On the large-chi split-tail route the per-step NS unroll makes
            # the chained tail kernels big enough to OOM-SIGKILL the remote
            # compile helper (measured chi=320 ECG shapes, r4); the QR
            # split-tail route is proven there, so demote.  NS covers the
            # monolithic-kernel range (chi <= 256 at ECG shapes: 1.6-2.3x
            # over QR, docs/tpu_performance.md).
            orth = "qr"

    def _m(f, *xs):
        """Map f over matching leaves: (re, im) pairs in the complex-pair
        representation, plain arrays otherwise."""
        if isinstance(xs[0], tuple):
            return tuple(f(*(x[j] for x in xs)) for j in range(2))
        return f(*xs)

    def _pairify(x):
        return (jnp.real(x).astype(jnp.float32),
                jnp.imag(x).astype(jnp.float32))

    def _combine(p):
        return jax.lax.complex(p[0], p[1]).astype(dtype)

    upd = partial(apply_update, eta=eta, loss=loss, bbopt=bbopt,
                  update_iters=update_iters, rescale=rescale,
                  axis_name=axis_name)
    e0 = boundary_env(N, chi, jnp.float32 if cplx else dtype)
    ls0 = jnp.zeros((N,), dtype=rdtype)
    if pallas:
        # the fused kernels keep the class axis major: [C, chi, d, chi]
        center = jnp.moveaxis(center, 3, 0)
    if cplx:
        # complex operands travel as (re, im) f32 pairs through the scans
        # (ops/pallas_bond_c.py); converted once per sweep, not per bond
        center = _pairify(center)
        cores = _pairify(cores)
        phis_c = _pairify(phis_c)
        LE = _pairify(LE)
        if warm:
            VB, UF = _pairify(VB), _pairify(UF)
        e0 = (e0, jnp.zeros_like(e0))

    # ---------------- backward half-sweep (center T-1 -> 0) ----------------
    # scan order jj = 0..T-2 maps to bond j = T-2-jj.
    fl = lambda a: jnp.flip(a, 0)
    xs_b = dict(
        A=_m(lambda c: fl(c[:T - 1]), cores),          # cores[j]
        phi_l=_m(lambda p: fl(p[:T - 1]), phis_c),     # phis_c[j]
        phi_r=_m(lambda p: fl(p[1:T]), phis_c),        # phis_c[j+1]
        le=_m(lambda e: fl(e[:T - 1]), LE),            # LE[j]
        le_ls=fl(LE_ls[:T - 1]),
    )
    if warm:
        xs_b["vb"] = _m(fl, VB)

    def backward_step(carry, x):
        with jax.named_scope("mps/backward_bond"):
            center, re_v, re_ls = carry
            if ritz_fused:
                center, V, v2, ls2, Qv = pallas_bond_c.bond_step_c_ritz(
                    x["A"], center, x["le"], re_v, re_ls, x["phi_l"],
                    x["phi_r"], y_onehot, class_weight, x["vb"], eta, cutoff,
                    forward=False, refresh=refresh, rot=ritz_rot,
                    power_iters=power_iters, max_rank=max_rank)
                return (center, v2, ls2), dict(V=V, re=v2, re_ls=ls2, qv=Qv)
            if cplx:
                center, V, v2, ls2, Qv = pallas_bond_c.bond_step_c(
                    x["A"], center, x["le"], re_v, re_ls, x["phi_l"],
                    x["phi_r"], y_onehot, class_weight, x["vb"], eta, cutoff,
                    forward=False, refresh=refresh, axis_name=axis_name,
                    power_iters=power_iters, orth=orth, max_rank=max_rank,
                    stream_tile=stream)
                return (center, v2, ls2), dict(V=V, re=v2, re_ls=ls2, qv=Qv)
            if pallas:
                center, V, v2, ls2, Qv = pallas_bond.bond_step(
                    x["A"], center, x["le"], re_v, re_ls, x["phi_l"],
                    x["phi_r"], y_onehot, class_weight, x["vb"], eta, cutoff,
                    forward=False, refresh=refresh, axis_name=axis_name,
                    power_iters=power_iters, orth=orth, max_rank=max_rank,
                    stream_tile=stream, loss=loss, bbopt=bbopt,
                    opp_ls=x["le_ls"])
                return (center, v2, ls2), dict(V=V, re=v2, re_ls=ls2, qv=Qv)
            BT = jnp.einsum("aim,mkbc->aikbc", x["A"], center)
            cost, BT = upd(BT, x["le"], re_v, x["phi_l"].conj(),
                           x["phi_r"].conj(), y_onehot, class_weight,
                           x["le_ls"] + re_ls)
            # split: rows (a,i,c) keep the label on the sweep side (:166-169)
            M = BT.transpose(0, 1, 4, 2, 3).reshape(chi * d * C, d * chi)
            if warm:
                US, Vh, Qv = wsl(M, x["vb"], chi, cutoff,
                                 q=power_iters, refresh=refresh,
                                 max_rank=max_rank, orth=orth)
            else:
                US, Vh = split_bond_left(M, chi, cutoff, svd_alg,
                                         max_rank=max_rank, orth=orth)
                Qv = None
            center = US.reshape(chi, d, C, chi).transpose(0, 1, 3, 2)
            V = Vh.reshape(chi, d, chi)
            v2, ls2 = env_step_right_scaled(re_v, re_ls, V, x["phi_r"])
            ys = dict(V=V, re=v2, re_ls=ls2)
            if warm:
                ys["qv"] = Qv
            if track_cost:
                ys["cost"] = cost
            return (center, v2, ls2), ys

    # Multi-bond block route (K12m / K12mc): one kernel per Bb consecutive
    # bonds — same eligibility as the single-kernel K12 (ns refresh /
    # frozen, no dp), remainder bonds through the single-bond body.
    # COMPLEX refresh blocks only at q<=1: the pair NS-subspace unroll is
    # the compile-size driver (~4x instructions per power step), and at the
    # complex default q=3 a Bb=4 block kernel exhausts Mosaic's kernel VMEM
    # stack (measured ECG200 fourier chi=64, v5e: q=1 blocks run at 0.0114
    # s/sweep, q=3 blocks fail scoped-vmem compile; the single-kernel K12
    # route is the proven q=3 path at 0.0239).  Frozen sweeps carry no
    # in-kernel power steps, so they block at any q.
    BB = (_auto_block(C, chi, d, N, T, factor=2 if cplx else 1,
                      cap=4 if cplx else 8)
          if (pallas and axis_name is None and not ritz_fused
              and stream is None
              and loss == "KLD"        # MSE bonds need per-bond opposite-
                                       # side log-scales the block kernel
                                       # does not carry; K12 handles them
              and (orth == "ns" or not refresh)
              and not (cplx and refresh and power_iters > 1)) else 1)
    block_steps = (pallas_bond_c.bond_block_steps_c if cplx
                   else pallas_bond.bond_block_steps)
    blk_kw = {} if cplx else {"bbopt": bbopt}

    def _scan_blocked(block_fn, carry, xs, block_keys):
        """Scan block_fn over [nb, BB]-blocked xs, then run the remainder
        bonds as ONE more (rem-sized) block call — the block kernels are
        Bb-static, so the tail is just another instantiation and each
        half-sweep issues nb+1 kernels total; ys come back per-bond in
        update order."""
        nbonds = T - 1
        nb = nbonds // BB
        ncov = nb * BB

        def blk(a):
            return a[:ncov].reshape((nb, BB) + a.shape[1:])

        xs_h = {k: _m(blk, xs[k]) for k in block_keys}
        carry, ys_h = jax.lax.scan(block_fn, carry, xs_h)
        ys_h = {k: _m(lambda a: a.reshape((ncov,) + a.shape[2:]), v)
                for k, v in ys_h.items()}
        if ncov < nbonds:
            xs_t = {k: _m(lambda a: a[ncov:], xs[k]) for k in block_keys}
            carry, ys_t = block_fn(carry, xs_t)
            ys_h = {k: _m(lambda a, b: jnp.concatenate([a, b]),
                          ys_h[k], ys_t[k]) for k in ys_h}
        return carry, ys_h

    if BB > 1:
        def backward_block(carry, x):
            center, re_v, re_ls = carry
            center, V, env_b, ls_b, Qv = block_steps(
                x["A"], center, x["le"], re_v, re_ls, x["phi_l"],
                x["phi_r"], y_onehot, class_weight, x["vb"], eta, cutoff,
                forward=False, refresh=refresh, power_iters=power_iters,
                orth=orth, max_rank=max_rank, **blk_kw)
            return (center, _m(lambda a: a[-1], env_b), ls_b[-1]), dict(
                V=V, re=env_b, re_ls=ls_b, qv=Qv)

        (center, _, _), ys_b = _scan_blocked(
            backward_block, (center, e0, ls0), xs_b,
            ("A", "le", "phi_l", "phi_r", "vb"))
    else:
        (center, _, _), ys_b = jax.lax.scan(backward_step, (center, e0, ls0),
                                            xs_b)
    # new cores[1..T-1] (emitted for j = T-2..0 -> slots T-1..1)
    cores_mid = _m(lambda c, v: jnp.concatenate([c[:1], fl(v)], 0),
                   cores, ys_b["V"])
    if warm:
        VB = _m(fl, ys_b["qv"])
    # RE stack for the forward pass: emissions are RE[j+1] (sites j+1..T-1 of
    # the post-backward cores); forward bond j reads RE[j+2] for j=0..T-2,
    # i.e. slots 2..T-1 plus the boundary at slot T.
    re_slots = _m(fl, ys_b["re"])               # slots 1..T-1
    re_ls_slots = fl(ys_b["re_ls"])
    xs_re = _m(lambda r, e: jnp.concatenate([r[1:], e[None]], 0),
               re_slots, e0)
    xs_re_ls = jnp.concatenate([re_ls_slots[1:], ls0[None]], 0)

    # ---------------- forward half-sweep (center 0 -> T-1) -----------------
    xs_f = dict(
        B=_m(lambda c: c[1:T], cores_mid),     # cores[j+1]
        phi_l=_m(lambda p: p[:T - 1], phis_c),
        phi_r=_m(lambda p: p[1:T], phis_c),
        re=xs_re,                              # RE[j+2]
        re_ls=xs_re_ls,
    )
    if warm:
        xs_f["uf"] = UF

    def forward_step(carry, x):
        with jax.named_scope("mps/forward_bond"):
            center, le_v, le_ls = carry
            if ritz_fused:
                center, Unew, v2, ls2, Qu = pallas_bond_c.bond_step_c_ritz(
                    x["B"], center, le_v, x["re"], le_ls, x["phi_l"],
                    x["phi_r"], y_onehot, class_weight, x["uf"], eta, cutoff,
                    forward=True, refresh=refresh, rot=ritz_rot,
                    power_iters=power_iters, max_rank=max_rank)
                return (center, v2, ls2), dict(U=Unew, le=v2, le_ls=ls2,
                                               qu=Qu)
            if cplx:
                center, Unew, v2, ls2, Qu = pallas_bond_c.bond_step_c(
                    x["B"], center, le_v, x["re"], le_ls, x["phi_l"],
                    x["phi_r"], y_onehot, class_weight, x["uf"], eta, cutoff,
                    forward=True, refresh=refresh, axis_name=axis_name,
                    power_iters=power_iters, orth=orth, max_rank=max_rank,
                    stream_tile=stream)
                return (center, v2, ls2), dict(U=Unew, le=v2, le_ls=ls2,
                                               qu=Qu)
            if pallas:
                center, Unew, v2, ls2, Qu = pallas_bond.bond_step(
                    x["B"], center, le_v, x["re"], le_ls, x["phi_l"],
                    x["phi_r"], y_onehot, class_weight, x["uf"], eta, cutoff,
                    forward=True, refresh=refresh, axis_name=axis_name,
                    power_iters=power_iters, orth=orth, max_rank=max_rank,
                    stream_tile=stream, loss=loss, bbopt=bbopt,
                    opp_ls=x["re_ls"])
                return (center, v2, ls2), dict(U=Unew, le=v2, le_ls=ls2,
                                               qu=Qu)
            BT = jnp.einsum("aimc,mkb->aikbc", center, x["B"])
            cost, BT = upd(BT, le_v, x["re"], x["phi_l"].conj(),
                           x["phi_r"].conj(), y_onehot, class_weight,
                           le_ls + x["re_ls"])
            M = BT.reshape(chi * d, d * chi * C)
            if warm:
                U, SVh, Qu = wsr(M, x["uf"], chi, cutoff,
                                 q=power_iters, refresh=refresh,
                                 max_rank=max_rank, orth=orth)
            else:
                U, SVh = split_bond_right(M, chi, cutoff, svd_alg,
                                          max_rank=max_rank, orth=orth)
                Qu = None
            Unew = U.reshape(chi, d, chi)
            center = SVh.reshape(chi, d, chi, C)
            v2, ls2 = env_step_left_scaled(le_v, le_ls, Unew, x["phi_l"])
            ys = dict(U=Unew, le=v2, le_ls=ls2)
            if warm:
                ys["qu"] = Qu
            if track_cost:
                ys["cost"] = cost
            return (center, v2, ls2), ys

    if BB > 1:
        def forward_block(carry, x):
            center, le_v, le_ls = carry
            center, U, env_b, ls_b, Qu = block_steps(
                x["B"], center, x["re"], le_v, le_ls, x["phi_l"],
                x["phi_r"], y_onehot, class_weight, x["uf"], eta, cutoff,
                forward=True, refresh=refresh, power_iters=power_iters,
                orth=orth, max_rank=max_rank, **blk_kw)
            return (center, _m(lambda a: a[-1], env_b), ls_b[-1]), dict(
                U=U, le=env_b, le_ls=ls_b, qu=Qu)

        (center, _, _), ys_f = _scan_blocked(
            forward_block, (center, e0, ls0), xs_f,
            ("B", "re", "phi_l", "phi_r", "uf"))
    else:
        (center, _, _), ys_f = jax.lax.scan(forward_step, (center, e0, ls0),
                                            xs_f)
    cores_out = _m(lambda u, c: jnp.concatenate([u, c[T - 1:]], 0),
                   ys_f["U"], cores_mid)
    if warm:
        UF = ys_f["qu"]
    # LE stack for the next backward pass: slot 0 = boundary, slots 1..T-1
    # from the forward emissions (exact environments of cores_out).
    LE_out = _m(lambda e, l: jnp.concatenate([e[None], l], 0), e0, ys_f["le"])
    LE_ls_out = jnp.concatenate([ls0[None], ys_f["le_ls"]], 0)
    if cplx:
        # back to complex once per sweep (the inter-sweep state in
        # full_sweeps' fori loop stays complex-typed)
        cores_out = _combine(cores_out)
        center = _combine(center)
        LE_out = _combine(LE_out)
        if warm:
            VB, UF = _combine(VB), _combine(UF)
    if pallas:
        center = jnp.moveaxis(center, 0, 3)
    costs = (jnp.concatenate([ys_b["cost"], ys_f["cost"]])
             if track_cost else None)
    return cores_out, center, LE_out, LE_ls_out, VB, UF, costs


def _sweep_once(cores: jnp.ndarray, center: jnp.ndarray, phis_c: jnp.ndarray,
                y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
                eta, cutoff, *, loss: str, bbopt: str, update_iters: int,
                rescale: Tuple[bool, bool], svd_alg: str, subspaces=None,
                power_iters: int = 1, orth: str = "qr",
                refresh: bool = True, ritz_rot: str = "eigh",
                track_cost: bool = False,
                axis_name: Optional[str] = None,
                platform: Optional[str] = None, max_rank=None):
    """Single self-contained sweep (builds the left environments itself).

    Returns (cores, center) — plus ``subspaces`` when
    ``svd_alg="randomized_warm"``, plus the per-bond cost trace [2(T-1)]
    when ``track_cost``."""
    T, chi, d, _ = cores.shape
    warm = svd_alg in WARM_ALGS
    if warm and subspaces is None:
        subspaces = init_subspaces(T, chi, d, cores.dtype)
    VB, UF = subspaces if warm else (None, None)
    LE, LE_ls = init_left_env_state(cores, phis_c)
    cores, center, _, _, VB, UF, costs = _sweep_core(
        cores, center, LE, LE_ls, VB, UF, phis_c, y_onehot, class_weight,
        eta, cutoff, loss=loss, bbopt=bbopt, update_iters=update_iters,
        rescale=rescale, svd_alg=svd_alg, power_iters=power_iters,
        orth=orth, refresh=refresh, ritz_rot=ritz_rot,
        track_cost=track_cost, axis_name=axis_name, platform=platform,
        max_rank=max_rank)
    if warm:
        out = (cores, center, (VB, UF))
    else:
        out = (cores, center)
    if track_cost:
        out = out + (costs,)
    return out


def _full_sweep_impl(cores: jnp.ndarray, center: jnp.ndarray,
                     phis_c: jnp.ndarray, y_onehot: jnp.ndarray,
                     class_weight: jnp.ndarray,
                     eta, cutoff, *, loss: str, bbopt: str, update_iters: int,
                     rescale: Tuple[bool, bool], svd_alg: str,
                     power_iters: int = 1, orth: str = "qr",
                     track_cost: bool = False,
                     axis_name: Optional[str] = None,
                     platform: Optional[str] = None, max_rank=None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    out = _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                      eta, cutoff, loss=loss, bbopt=bbopt,
                      update_iters=update_iters, rescale=rescale,
                      svd_alg=svd_alg, power_iters=power_iters, orth=orth,
                      track_cost=track_cost,
                      axis_name=axis_name, platform=platform,
                      max_rank=max_rank)
    if track_cost:
        return out[0], out[1], out[-1]
    return out[0], out[1]


_FULL_SWEEP_STATICS = ("loss", "bbopt", "update_iters", "rescale",
                       "svd_alg", "power_iters", "orth",
                       "track_cost", "axis_name", "platform")
_full_sweep_jit = partial(jax.jit, static_argnames=_FULL_SWEEP_STATICS)(
    _full_sweep_impl)
_full_sweep_jit_don = partial(jax.jit, static_argnames=_FULL_SWEEP_STATICS,
                              donate_argnums=(0, 1))(_full_sweep_impl)


def full_sweep(cores, center, *args, donate: bool = False, **kw):
    """One full sweep per device call (cores, center) -> (cores, center).

    With svd_alg="randomized_warm" the subspace caches are cold-started
    every call; use :func:`full_sweeps` (or full_sweep_warm) to accumulate
    them across sweeps.  ``track_cost`` appends the per-bond loss trace
    [2(T-1)] to the return tuple.

    ``donate=True`` donates the cores/center input buffers to the call
    (jit donate_argnums), letting XLA alias them with the outputs — at
    chi >= 256 the core stack is >100 MB, so donation halves the call's
    peak footprint and skips a copy (SURVEY §7.2 step 9).  The production
    path (fit_mps) donates; the default stays False because parity tests
    and probes re-feed the same arrays to several routes, which donation
    turns into use-after-delete errors."""
    fn = _full_sweep_jit_don if donate else _full_sweep_jit
    return fn(cores, center, *args, **kw)


_FULL_SWEEP_WARM_STATICS = ("loss", "bbopt", "update_iters", "rescale",
                            "svd_alg", "power_iters", "orth",
                            "refresh", "ritz_rot",
                            "track_cost", "axis_name", "platform")


def _full_sweep_warm_impl(cores, center, subspaces, phis_c, y_onehot,
                          class_weight, eta, cutoff, *, loss: str,
                          bbopt: str, update_iters: int,
                          rescale: Tuple[bool, bool], svd_alg: str,
                          power_iters: int = 1, orth: str = "qr",
                          refresh: bool = True, ritz_rot: str = "eigh",
                          track_cost: bool = False,
                          axis_name: Optional[str] = None,
                          platform: Optional[str] = None, max_rank=None):
    return _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                       eta, cutoff, subspaces=subspaces, loss=loss,
                       bbopt=bbopt, update_iters=update_iters,
                       rescale=rescale, svd_alg=svd_alg,
                       power_iters=power_iters, orth=orth, refresh=refresh,
                       ritz_rot=ritz_rot,
                       track_cost=track_cost, axis_name=axis_name,
                       platform=platform, max_rank=max_rank)


_full_sweep_warm_jit = partial(
    jax.jit, static_argnames=_FULL_SWEEP_WARM_STATICS)(_full_sweep_warm_impl)
_full_sweep_warm_jit_don = partial(
    jax.jit, static_argnames=_FULL_SWEEP_WARM_STATICS,
    donate_argnums=(0, 1, 2))(_full_sweep_warm_impl)


def full_sweep_warm(cores, center, subspaces, *args, donate: bool = False,
                    **kw):
    """One sweep with explicit warm-subspace state: pass the ``subspaces``
    returned by the previous call (init with :func:`init_subspaces`) so the
    caches accumulate across per-sweep host calls (fit_mps's logging path).
    ``refresh=False`` runs a frozen-subspace sweep (split against the cached
    bases; no power step, no QR).  Returns (cores, center, subspaces) — plus
    the per-bond cost trace when ``track_cost``.

    ``donate=True`` donates cores/center/subspaces to the call (see
    :func:`full_sweep`); fit_mps's per-sweep loop donates since it threads
    all three through every sweep."""
    fn = _full_sweep_warm_jit_don if donate else _full_sweep_warm_jit
    return fn(cores, center, subspaces, *args, **kw)


def _full_sweeps_impl(cores: jnp.ndarray, center: jnp.ndarray,
                      phis_c: jnp.ndarray, y_onehot: jnp.ndarray,
                      class_weight: jnp.ndarray,
                      eta, cutoff, *, nsweeps: int, loss: str, bbopt: str,
                      update_iters: int, rescale: Tuple[bool, bool],
                      svd_alg: str, power_iters: int = 1, orth: str = "qr",
                      refresh_every: int = 1, ritz_exact_sweeps: int = -1,
                      ritz_exact_rot: str = "eigh",
                      ritz_track_rot: str = "track",
                      axis_name: Optional[str] = None,
                      platform: Optional[str] = None, max_rank=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``nsweeps`` full sweeps in ONE compiled call.

    Host dispatch to the device costs 10-30 ms per call (remote TPU service),
    so per-sweep dispatch is pure overhead whenever per-sweep host-side
    logging is off (hyperopt always trains with log_level=-1).  The sweep
    body is traced once; XLA sees a fori_loop over identical iterations.
    Left-environment state and (for svd_alg="randomized_warm") the per-bond
    subspace caches persist across the fused sweeps.

    ``refresh_every=K`` (warm only): refresh the per-bond subspaces (power
    step + QR) on sweeps 0, K, 2K, ...; in between, split against the
    frozen cached bases — the QR, the dominant per-bond cost once
    everything else is fused, drops out of (K-1)/K of the sweeps.

    ``ritz_exact_sweeps=n`` (ritz route only; static): run the per-bond
    eigen-rotation EXACTLY for the first n sweeps, then switch to an
    eigh-free tracker — the exact sweeps eigen-order the per-bond caches,
    after which tracking maintains the ordering and the eigh (the route's
    dominant TPU cost) leaves the steady-state critical path.  -1 = exact
    on every sweep (legacy behaviour).

    ``ritz_exact_rot``: rotation used on the exact sweeps — "eigh"
    (complex eigh; the CPU/bit-parity route) or "eigh_r" (ONE realified
    real eigh + complex re-extraction, ops/decomp._ritz_rot_eigh_realified
    — ~3x cheaper on TPU where the complex QDWH eigh is the outlier op).
    ``ritz_track_rot``: the tracker — "track" (QR-based orthogonal
    iteration, ops/decomp._ritz_rot_track) or "jacobi" (matmul-only
    adjacent-pair exact Jacobi, ops/decomp._ritz_rot_jacobi — the
    Mosaic-expressible tracker the fused pair kernels run in-kernel)."""
    T, chi, d, _ = cores.shape
    warm = svd_alg in WARM_ALGS
    kw = dict(loss=loss, bbopt=bbopt, update_iters=update_iters,
              rescale=rescale, svd_alg=svd_alg, power_iters=power_iters,
              orth=orth, axis_name=axis_name,
              platform=platform, max_rank=max_rank)
    LE, LE_ls = init_left_env_state(cores, phis_c)
    if warm:
        VB, UF = init_subspaces(T, chi, d, cores.dtype)
    else:
        VB, UF = None, None

    def unpack(state):
        if warm:
            return state
        cores, center, LE, LE_ls = state
        return cores, center, LE, LE_ls, None, None

    def pack(cores, center, LE, LE_ls, VB, UF):
        if warm:
            return cores, center, LE, LE_ls, VB, UF
        return cores, center, LE, LE_ls

    ritz_track = (svd_alg == "randomized_warm_ritz"
                  and ritz_exact_sweeps >= 0)

    def body(i, state):
        cores, center, LE, LE_ls, VB, UF = unpack(state)
        args = (cores, center, LE, LE_ls, VB, UF)

        def run(refresh, rot):
            return lambda a: _sweep_core(*a, phis_c, y_onehot, class_weight,
                                         eta, cutoff, refresh=refresh,
                                         ritz_rot=rot, **kw)[:6]

        def with_rot(refresh):
            if not ritz_track:
                return run(refresh, ritz_exact_rot)
            if ritz_exact_sweeps == 0:
                # static: no exact sweeps at all — don't compile the exact
                # branch (its XLA eigh sweep is minutes of compile the
                # pure-tracking program never runs)
                return run(refresh, ritz_track_rot)
            return lambda a: jax.lax.cond(i < ritz_exact_sweeps,
                                          run(refresh, ritz_exact_rot),
                                          run(refresh, ritz_track_rot), a)

        if warm and refresh_every > 1:
            out = jax.lax.cond(i % refresh_every == 0,
                               with_rot(True), with_rot(False), args)
        elif ritz_track:
            out = with_rot(True)(args)
        else:
            out = _sweep_core(*args, phis_c, y_onehot, class_weight,
                              eta, cutoff, ritz_rot=ritz_exact_rot,
                              **kw)[:6]
        return pack(*out)

    state0 = pack(cores, center, LE, LE_ls, VB, UF)
    out = jax.lax.fori_loop(0, nsweeps, body, state0)
    return out[0], out[1]


# nsweeps is a TRACED fori trip count (not static): hyperopt trials that
# differ only in sweep count share one compiled program
_FULL_SWEEPS_STATICS = (
    "loss", "bbopt", "update_iters", "rescale", "svd_alg", "power_iters",
    "orth", "refresh_every", "ritz_exact_sweeps", "ritz_exact_rot",
    "ritz_track_rot", "axis_name", "platform")
_full_sweeps_jit = partial(jax.jit, static_argnames=_FULL_SWEEPS_STATICS)(
    _full_sweeps_impl)
_full_sweeps_jit_don = partial(jax.jit, static_argnames=_FULL_SWEEPS_STATICS,
                               donate_argnums=(0, 1))(_full_sweeps_impl)


def full_sweeps(cores, center, *args, donate: bool = False, **kw):
    """``nsweeps`` full sweeps in ONE compiled call — see
    :func:`_full_sweeps_impl` for the semantics and knobs.  ``donate=True``
    donates the cores/center input buffers (see :func:`full_sweep`); the
    production path (fit_mps, bench) donates."""
    fn = _full_sweeps_jit_don if donate else _full_sweeps_jit
    return fn(cores, center, *args, **kw)


def _batched_full_sweeps_impl(cores, center, phis_c, y_onehot, class_weight,
                              eta, cutoff, *, nsweeps: int, loss: str,
                              bbopt: str, update_iters: int,
                              rescale: Tuple[bool, bool], svd_alg: str,
                              power_iters: int = 1, orth: str = "qr",
                              refresh_every: int = 1,
                              ritz_exact_sweeps: int = -1,
                              ritz_exact_rot: str = "eigh",
                              ritz_track_rot: str = "track", max_rank=None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train F independent MPS models in ONE vmapped program.

    Leading axis F on cores/center/phis_c/y_onehot/class_weight;
    eta/cutoff/max_rank may be scalars (shared) or [F] (per-model —
    padded hyperopt trials vary eta and the runtime chi cap, so a whole
    trial population trains as one call).  nsweeps is the shared traced
    fori bound.

    Forces the XLA bond path (platform="xla"): under vmap the model axis
    rides every per-bond op, so the op-issue skeleton amortizes across
    models the way the Pallas kernels amortize it within a bond — the
    complementary regime (many small fits: hyperopt folds and trial
    populations).  With orth="ns" the whole batched sweep is matmuls:
    the r3 "vmap fold-batching" dead end was the batched QR/eigh
    serializing per element, and the NS route retired the QR itself.
    Exception: svd_alg="randomized_warm_ritz" with ritz_exact_sweeps=-1
    keeps a per-bond [k, k] eigh, which vmap lowers to a per-model loop —
    ritz jobs batch correctly (fit_mps_batch partitions them into their
    own program) but that eigh does not amortize across models.  With the
    default exact->track schedule only the first ritz_exact_sweeps sweeps
    pay it; the tracked sweeps are matmul-only and batch fully.
    Reference posture: one sequential fit per (trial, fold),
    tuning.jl:158-176."""
    F = cores.shape[0]
    eta_b = jnp.broadcast_to(jnp.asarray(eta), (F,))
    cut_b = jnp.broadcast_to(jnp.asarray(cutoff), (F,))
    kw = dict(nsweeps=nsweeps, loss=loss, bbopt=bbopt,
              update_iters=update_iters, rescale=rescale, svd_alg=svd_alg,
              power_iters=power_iters, orth=orth,
              refresh_every=refresh_every,
              ritz_exact_sweeps=ritz_exact_sweeps,
              ritz_exact_rot=ritz_exact_rot,
              ritz_track_rot=ritz_track_rot,
              axis_name=None, platform="xla")

    if max_rank is None:
        def one(co, ce, ph, y1, w, et, cu):
            return _full_sweeps_impl(co, ce, ph, y1, w, et, cu,
                                     max_rank=None, **kw)
        return jax.vmap(one)(cores, center, phis_c, y_onehot,
                             class_weight, eta_b, cut_b)

    mr_b = jnp.broadcast_to(jnp.asarray(max_rank), (F,))

    def one_mr(co, ce, ph, y1, w, et, cu, mr):
        return _full_sweeps_impl(co, ce, ph, y1, w, et, cu,
                                 max_rank=mr, **kw)
    return jax.vmap(one_mr)(cores, center, phis_c, y_onehot,
                            class_weight, eta_b, cut_b, mr_b)


batched_full_sweeps = partial(jax.jit, static_argnames=(
    "loss", "bbopt", "update_iters", "rescale", "svd_alg", "power_iters",
    "orth", "refresh_every", "ritz_exact_sweeps", "ritz_exact_rot",
    "ritz_track_rot"))(_batched_full_sweeps_impl)
