"""Pallas TPU mega-kernels for the DMRG bond step.

The scan-based sweep (training/sweep.py) is op-*latency* bound on TPU: a
bond step is ~25 small XLA ops of a few microseconds' issue cost each,
while its actual MXU time is <1 us (measured: 66 us/bond skeleton at
ECG200 chi=64 on v5e).  These kernels collapse the whole bond step into
two ``pallas_call``s per bond, all operands resident in VMEM:

  K1:  form the two-site bond tensor, KLD gradient over the whole batch,
       TSGO update + renormalization, and the warm-subspace refresh —
       with ``orth="ns"`` (the accelerator default) each power step ends
       in an in-kernel matmul-only Newton-Schulz polar
       orthogonalization (_ns_orth_value), so K1 emits the orthonormal
       basis Q directly  ->  (BT_new, Q)
  K2:  Rayleigh quotients + ITensor-style cutoff mask (computed with an
       O(k^2) pairwise suffix rule instead of a sort), the split factors
       in their final core layouts, and the scaled environment step
       ->  (center, V/U, env, logscale)

With ``orth="qr"`` K1 emits the pre-orthogonalization Y instead and one
thin XLA QR runs between the kernels (K1 -> QR -> K2) — Householder QR
is the one op Pallas cannot express as matmuls.  Measured at ECG200
chi=64: ns 0.0085 s/sweep vs qr 0.0134 (docs/tpu_performance.md).

Mosaic constraints shape the implementation: vector reshapes that merge or
split the minor (lane) dimension are unsupported, so
 * Kronecker batch factors L[n,(a,i)] = le[n,a]*phi[n,i] are built as
   (le @ E_a) * (phi @ E_i) with iota-generated 0/1 selection matrices —
   two MXU matmuls, no reshape;
 * the bond tensor crosses the kernels as [C, chi*d, d, chi] and every
   contraction over the (k,b) column group is statically unrolled over the
   tiny physical index k (d is 3..8), so all slices are leading-dim.

Covers the accelerator hot paths: real float32, {KLD, MSE} loss x
{TSGO, GD} optimiser (r5 — the MSE gradient differs by one per-sample
weight term and the true-scale factor exp(env_ls); GD skips the gradient
normalization), update_iters=1, rescale=(False, True),
svd_alg="randomized_warm" (training/sweep.py falls back to the XLA path
otherwise; complex64 takes the real-imag pair twin in
ops/pallas_bond_c.py, which remains KLD+TSGO only).  The multi-bond
block route (K12m) covers KLD only — MSE bonds run the single-kernel
K12 (the block kernel would need per-bond opposite-side log-scale
operands).

Class-axis layout: the center travels as [C, chi_l, d, chi_r].

Reference semantics: loss/gradient loss_functions.jl:302-379, TSGO :59-86,
truncation decomposeBT RealRealHighDimension.jl:146-203 (cutoff = relative
tail-sum of squared singular values).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False   # flipped by tests / CPU runs via set_interpret()

# Mosaic's default scoped-VMEM budget (~16 MB) is well below the physical
# VMEM on v5e; raising it per-kernel lets the fused path compile far past
# the old chi=128 ceiling.  Measured (ECG200 shapes, v5e): chi=192 runs
# 0.066 s/sweep and chi=256 runs 0.095 s/sweep fused at a 64 MB budget
# (vs 0.095 / 0.158 on the XLA fallback); a 100 MB budget exceeds the
# physical VMEM and the compiler rejects it.  _VMEM_LIMIT_BYTES overrides
# the automatic footprint rule when set (measurement scripts).
_VMEM_LIMIT_BYTES = None
_DEFAULT_BUDGET = 6 * 2 ** 20     # fits Mosaic's default scoped budget
_RAISED_BUDGET = 64 * 2 ** 20     # measured good through chi=256
_BIG_BUDGET = 96 * 2 ** 20        # chi=320/384 split-tail kernels (r4)
SPLIT_TAIL_FOOTPRINT = 18 * 2 ** 20  # past this, bond_step splits the
                                  # warm power step into its own kernel
                                  # (the monolithic K1 tail crashes the
                                  # Mosaic compiler past chi=256)
MAX_FOOTPRINT = 18 * 2 ** 20      # ceiling for kernels that carry the
                                  # in-kernel power tail (monolithic K1 and
                                  # the complex pair kernels)
BLOCK_MAX_FOOTPRINT = 12 * 2 ** 20  # ceiling for the multi-bond block
                                  # kernel (K12m): blocks engage only while
                                  # the Bb-blocked operands + center scratch
                                  # fit comfortably under the monolith
                                  # range — large chi is compute-bound and
                                  # keeps the single-bond K12
SPLIT_MAX_FOOTPRINT = 30 * 2 ** 20  # ceiling for the real split-tail route:
                                  # chi=320 at ECG shapes (est 26 MB) runs
                                  # fused at 0.164 s/sweep; chi=384 (37 MB)
                                  # gets the remote compile helper SIGKILLed
                                  # (memory) even on a quiet machine — the
                                  # caller falls back to the XLA path past
                                  # this (sweep.py guard)


def kernel_footprint(C: int, chi: int, d: int, N: int) -> int:
    """Estimated VMEM residents of the fused bond kernels: the bond tensor
    [C, chi*d, d, chi], the subspace / power-step buffers [chi*d, chi] x2,
    and the batch kron factors [N, chi*d] x2 — kernel temporaries cost
    roughly as much again, which the raised budget absorbs."""
    f = 4  # f32 bytes
    bt = C * chi * d * d * chi * f
    subspace = 2 * (chi * d * chi) * f
    batch = 2 * N * chi * d * f + 2 * N * chi * f
    return bt + subspace + batch


def k12_footprint(C: int, chi: int, d: int, N: int) -> int:
    """Estimated VMEM residents of the SINGLE-kernel bond step (K12): the
    two-kernel working set plus K2's additions that now share the kernel —
    the projected split blocks + masked center emission (~2x bt/d), the new
    core, and the env outputs.  Gating K12 on this (not kernel_footprint)
    keeps the fused-everything kernel out of the ~18 MB band where the
    in-kernel power tail is known to crash the Mosaic compiler; shapes past
    it fall back to the proven two-kernel / split-tail routes."""
    f = 4
    k2_extra = (2 * C * chi * d * chi + chi * d * chi + 2 * N * chi) * f
    return kernel_footprint(C, chi, d, N) + k2_extra


def set_interpret(flag: bool) -> None:
    """Run the kernels in interpreter mode (CPU testing)."""
    global _INTERPRET
    _INTERPRET = bool(flag)


def set_vmem_limit(nbytes) -> None:
    """Override (or clear, with None) the automatic Mosaic scoped-VMEM
    budget for every bond-kernel pallas_call."""
    global _VMEM_LIMIT_BYTES
    _VMEM_LIMIT_BYTES = None if nbytes is None else int(nbytes)


def _compiler_kw(est: Optional[int] = None) -> dict:
    if _INTERPRET:
        return {}
    if _VMEM_LIMIT_BYTES is not None:
        return dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES))
    if est is not None and est > SPLIT_TAIL_FOOTPRINT:
        return dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BIG_BUDGET))
    if est is not None and est > _DEFAULT_BUDGET:
        return dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_RAISED_BUDGET))
    return {}


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _smem_scalar():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _sel_left(chi: int, d: int, dtype):
    """E_a [chi, chi*d]: E_a[a, a*d+i] = 1  (row index is the major factor)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chi, chi * d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chi, chi * d), 1)
    return (cols // d == rows).astype(dtype)


def _sel_right(chi: int, d: int, dtype):
    """E_i [d, chi*d]: E_i[i, a*d+i] = 1  (row index is the minor factor)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, chi * d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, chi * d), 1)
    return (cols % d == rows).astype(dtype)


def _kron_batch_major(major, minor):
    """[N, P] x [N, Q] -> [N, P*Q] with the first factor major:
    out[n, p*Q+q] = major[n,p] * minor[n,q] — via selection-matrix matmuls."""
    f32 = jnp.float32
    P = major.shape[1]
    Q = minor.shape[1]
    EA = _sel_left(P, Q, f32)
    EI = _sel_right(P, Q, f32)
    return (jnp.dot(major, EA, preferred_element_type=f32)
            * jnp.dot(minor, EI, preferred_element_type=f32))


# --------------------------------------------------------------------------
# K1: bond tensor + KLD gradient + TSGO step + power step
# --------------------------------------------------------------------------

def _ns_orth_value(X):
    """Matmul-only Newton-Schulz polar orthogonalization of a live value
    (Mosaic-safe twin of ops/decomp.ns_orth — same coefficients and
    iteration counts so the fused and XLA paths stay in parity; no
    jnp.eye: X @ (aI + bG + cG2) is algebraically a*X + X @ (bG + cG2)).
    Emitting the orthonormal basis straight from the kernel removes the
    per-bond XLA QR — the one op that forced a K1 -> QR -> K2 split.
    Used per power step (subspace iteration with eps-revival): see
    ops/decomp._NS_REVIVE for the two measured failure modes that rule
    out a single end-of-loop orthogonalization."""
    from .decomp import _NS_CUBIC, _NS_QA, _NS_QB, _NS_QC, _NS_QUINTIC
    f32 = jnp.float32
    nf2 = jnp.sum(X * X) * f32(1.0 + 1e-3) ** 2
    X = X * jax.lax.rsqrt(jnp.maximum(nf2, jnp.finfo(f32).tiny))
    # fori_loop bodies, NOT Python unrolls: Mosaic compile cost (and its
    # kernel scratch accounting) scales with unrolled body count — the
    # unrolled 14-step NS tail was the compile-resource driver behind the
    # chi=384 SIGKILL / 18 MB monolith ceilings (r5 bisect; same pathology
    # as the K12cr jacobi rounds, ~30 s compile per unrolled body at k=64)
    def _quintic(_, X):
        G = jax.lax.dot_general(X, X, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        G2 = jnp.dot(G, G, preferred_element_type=f32)
        return _NS_QA * X + jnp.dot(X, _NS_QB * G + _NS_QC * G2,
                                    preferred_element_type=f32)

    def _cubic(_, X):
        G = jax.lax.dot_general(X, X, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        return 1.5 * X - 0.5 * jnp.dot(X, G, preferred_element_type=f32)

    X = jax.lax.fori_loop(0, _NS_QUINTIC, _quintic, X)
    return jax.lax.fori_loop(0, _NS_CUBIC, _cubic, X)


def _power_step_tail(BT, V0, y_ref, *, C: int, chi: int, d: int,
                     forward: bool, emit_y: bool, q: int,
                     orth: str = "qr") -> None:
    """Warm power step(s): q applications of the bond-tensor Gram to the
    cached subspace, per-column normalization between steps (q > 1 would
    otherwise raise the dynamic range to the (2q)-th power and overflow
    f32 mid-iteration).  q resolves from MPSOptions.subspace_power_iters —
    complex encodings default to 3 (docs/complex_split_oracle.md: one step
    underfits fourier's +-paired degenerate spectra).

    backward: Y[(k,b), :] <- sum_c BT_c^T (BT_c Y_k-blocks)   per step
    forward:  Y[(a,i), :] <- sum_c BT_c (BT_c^T Y)            per step
    """
    f32 = jnp.float32
    if not emit_y:
        y_ref[:] = V0     # frozen sweep: pass the cached basis through
        return
    from .decomp import _NS_REVIVE
    Y = V0
    for _ in range(q):
        if not forward:
            for c in range(C):
                MV = None                                  # [chi*d, chi]
                for k in range(d):
                    Yk = Y[k * chi:(k + 1) * chi, :]       # [chi, chi]
                    term = jnp.dot(BT[c][k], Yk, preferred_element_type=f32)
                    MV = term if MV is None else MV + term
                for k in range(d):
                    yk = jnp.dot(BT[c][k].T, MV, preferred_element_type=f32)
                    if c == 0:
                        y_ref[k * chi:(k + 1) * chi, :] = yk
                    else:
                        y_ref[k * chi:(k + 1) * chi, :] = (
                            y_ref[k * chi:(k + 1) * chi, :] + yk)
            Ynew = y_ref[:]
        else:
            # accumulate through y_ref (not a live [chi*d, chi] value) and
            # contract the leading dim via dot_general instead of
            # materializing BT^T — the live-value form crashes the Mosaic
            # compiler at chi=320 (bisect: scripts/k1_fwd_bisect.py)
            for c in range(C):
                for k in range(d):
                    MtU = jax.lax.dot_general(
                        BT[c][k], Y, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)        # [chi, chi]
                    term = jnp.dot(BT[c][k], MtU, preferred_element_type=f32)
                    if c == 0 and k == 0:
                        y_ref[:] = term
                    else:
                        y_ref[:] = y_ref[:] + term
            Ynew = y_ref[:]
        nrm = jnp.sqrt(jnp.sum(Ynew * Ynew, axis=0, keepdims=True))
        Ynorm = Ynew / jnp.maximum(nrm, jnp.finfo(f32).tiny)
        if orth == "ns":
            # subspace iteration: revival + in-kernel polar per step;
            # y_ref leaves as the orthonormal Q, no XLA QR needed
            Y = _ns_orth_value(Ynorm + f32(_NS_REVIVE) * Y)
        else:
            Y = Ynorm
    y_ref[:] = Y


def _k1_tail_kernel(v0_ref, bt_ref, y_ref, *, C: int, chi: int, d: int,
                    forward: bool, q: int, orth: str = "qr"):
    """Standalone warm power step for large chi: the monolithic K1 with
    the in-kernel tail crashes the Mosaic compiler past chi=256 (the tail
    keeps all C*d bond-tensor blocks live through two extra matmuls each;
    bisect: scripts/k1_fwd_bisect.py), so bond_step splits the tail into
    its own kernel when the footprint is large — BT is re-read from the
    K1 output ref block-by-block, exactly the access pattern K2 already
    compiles at chi=384."""
    BT = [[bt_ref[c, :, k, :] for k in range(d)] for c in range(C)]
    _power_step_tail(BT, v0_ref[:], y_ref, C=C, chi=chi, d=d,
                     forward=forward, emit_y=True, q=q, orth=orth)


def _k1_tail_call(BT, V0, *, C, chi, d, forward, q, orth="qr", est=None):
    f32 = jnp.float32
    kern = functools.partial(_k1_tail_kernel, C=C, chi=chi, d=d,
                             forward=forward, q=q, orth=orth)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((chi * d, chi), f32),
        in_specs=[_vmem()] * 2,
        out_specs=_vmem(),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(V0, BT)


def _ref_accessors(left_ref, right_ref, chi, d, forward):
    """The single-bond kernels' operand accessors for _k1_body: left/right
    read straight from the pallas input refs (backward pre-merge happens
    here; forward arrives pre-merged from the caller)."""
    if forward:
        return (lambda c: left_ref[c]), (lambda k: right_ref[k])
    return (lambda: left_ref[:].reshape(chi * d, chi),
            lambda c, k: right_ref[c, :, k, :])


def _k1_body(eta, left_at, right_at, le, re, phil, phir, y1h, w, V0,
             y_ref, *, C: int, chi: int, d: int, forward: bool,
             emit_y: bool, q: int, orth: str, loss: str = "KLD",
             bbopt: str = "TSGO", gls=None):
    """Shared K1 math: bond-tensor blocks BT[c][k] [chi*d, chi] (returned
    as live values), batched loss gradient (KLD or MSE), the optimiser
    step (TSGO normalized-gradient or plain GD) with post-normalization,
    and the warm power step written to y_ref.

    ``loss="MSE"`` needs the TOTAL per-sample env log-scales ``gls``
    [N, 1] (left + right — the MSE residual is against the true-scale
    yhat, ops/bond_update.py:79-99); the KLD gradient is scale-invariant
    and ignores it.

    Operands arrive through accessors so the same body serves the
    single-bond kernels (ref-backed) and the multi-bond block kernel
    (scratch-backed carry):
    backward: left_at() -> merged A2 [chi*d, chi],
              right_at(c, k) -> center block [chi, chi]
              (center[c, m, k, b], left bond m); Y spans the (k,b) side.
    forward:  left_at(c) -> merged center class slice [chi*d, chi]
              (the caller pre-merges — Mosaic crashes on per-class
              ref-slice reshapes at large chi, scripts/k1_fwd_bisect.py),
              right_at(k) -> B block [chi, chi]; Y spans the (a,i) side."""
    f32 = jnp.float32

    L = _kron_batch_major(le, phil)   # [N, chi*d] cols (a, i)

    if not forward:
        A2 = left_at()                                # merged [chi*d, chi]

    # ---- BT blocks + per-class scaled yhat --------------------------------
    BT = [[None] * d for _ in range(C)]
    yhat = []
    for c in range(C):
        acc = None
        if forward:
            Cc2 = left_at(c)                          # [chi*d, chi]
        for k in range(d):
            if forward:
                Bk = right_at(k)                      # [chi, chi]
                BT_ck = jnp.dot(Cc2, Bk, preferred_element_type=f32)
            else:
                Cck = right_at(c, k)                  # [chi, chi]
                BT_ck = jnp.dot(A2, Cck, preferred_element_type=f32)
            BT[c][k] = BT_ck                          # [chi*d, chi]
            t_ck = jnp.dot(L, BT_ck, preferred_element_type=f32)  # [N, chi]
            R_k = phir[:, k:k + 1] * re               # [N, chi]
            part = jnp.sum(t_ck * R_k, axis=1, keepdims=True)     # [N, 1]
            acc = part if acc is None else acc + part
        yhat.append(acc)

    # ---- gradient + optimiser step + renormalize ---------------------------
    if loss == "KLD":
        y_true = sum(yhat[c] * y1h[:, c:c + 1] for c in range(C))  # [N, 1]
        u = w / y_true
    else:                       # MSE: resid against true-scale yhat
        s = jnp.exp(gls)                              # [N, 1]
        ws = w * s
    G = [[None] * d for _ in range(C)]
    g2 = jnp.zeros((), f32)
    for c in range(C):
        if loss == "KLD":
            wc = y1h[:, c:c + 1] * u                  # [N, 1]
        else:
            wc = (yhat[c] * s - y1h[:, c:c + 1]) * ws
        for k in range(d):
            R_k = phir[:, k:k + 1] * re
            G_ck = jnp.dot(L.T, R_k * wc, preferred_element_type=f32)
            if loss == "KLD":
                G_ck = -G_ck
            G[c][k] = G_ck
            if bbopt == "TSGO":
                g2 = g2 + jnp.sum(G_ck * G_ck)
    if bbopt == "TSGO":
        step = eta * jax.lax.rsqrt(jnp.maximum(g2, jnp.finfo(f32).tiny))
    else:                       # GD: fixed-step (loss_functions.jl:27-57)
        step = eta

    b2 = jnp.zeros((), f32)
    for c in range(C):
        for k in range(d):
            BT[c][k] = BT[c][k] - step * G[c][k]
            b2 = b2 + jnp.sum(BT[c][k] * BT[c][k])
    bn = jax.lax.rsqrt(jnp.maximum(b2, jnp.finfo(f32).tiny))
    for c in range(C):
        for k in range(d):
            BT[c][k] = BT[c][k] * bn

    # ---- warm power step(s) ------------------------------------------------
    _power_step_tail(BT, V0, y_ref, C=C, chi=chi, d=d, forward=forward,
                     emit_y=emit_y, q=q, orth=orth)
    return BT


def _k1_kernel(eta_ref, left_ref, right_ref, le_ref, re_ref, phil_ref,
               phir_ref, y1h_ref, w_ref, gls_ref, v0_ref, bt_ref, y_ref, *,
               C: int, chi: int, d: int, forward: bool,
               emit_y: bool = True, q: int = 1, orth: str = "qr",
               loss: str = "KLD", bbopt: str = "TSGO"):
    """_k1_body + bond-tensor emission (the two-kernel route: BT crosses
    to K2 through HBM)."""
    left_at, right_at = _ref_accessors(left_ref, right_ref, chi, d, forward)
    BT = _k1_body(eta_ref[0, 0], left_at, right_at, le_ref[:], re_ref[:],
                  phil_ref[:], phir_ref[:], y1h_ref[:], w_ref[:], v0_ref[:],
                  y_ref, C=C, chi=chi, d=d, forward=forward, emit_y=emit_y,
                  q=q, orth=orth, loss=loss, bbopt=bbopt, gls=gls_ref[:])
    for c in range(C):
        for k in range(d):
            bt_ref[c, :, k, :] = BT[c][k]


def _k1_call(eta, left, right, le, re, phil, phir, y1h, w, gls, V0, *,
             C, chi, d, forward, emit_y=True, q=1, orth="qr",
             loss="KLD", bbopt="TSGO", est=None):
    f32 = jnp.float32
    if forward:
        left = left.reshape(C, chi * d, chi)   # free relayout outside Mosaic
        right = right.transpose(1, 0, 2)       # [d, chi, chi]: leading k slices
    out_shape = (
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
    )
    kern = functools.partial(_k1_kernel, C=C, chi=chi, d=d, forward=forward,
                             emit_y=emit_y, q=q, orth=orth, loss=loss,
                             bbopt=bbopt)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_smem_scalar()] + [_vmem()] * 10,
        out_specs=(_vmem(), _vmem()),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(eta, left, right, le, re, phil, phir, y1h, w, gls, V0)


# --------------------------------------------------------------------------
# K1 split for data-parallel meshes: local gradient / global update.
#
# Under a dp mesh the batch-touching work runs per-shard inside shard_map
# (pallas_call is a custom call GSPMD cannot partition): K1a computes the
# LOCAL batch's gradient, the caller psums it over the mesh axis — the one
# collective per bond update — and K1b applies the TSGO step + power step
# redundantly on every device (replicated operands, standard DP pattern).
# --------------------------------------------------------------------------

def _k1_grad_kernel(left_ref, right_ref, le_ref, re_ref, phil_ref,
                    phir_ref, y1h_ref, w_ref, gls_ref, g_ref, *,
                    C: int, chi: int, d: int, forward: bool,
                    loss: str = "KLD"):
    """Local-batch loss gradient G[c, (a,i), k, b] (the pre-psum contribution
    of this shard's samples; see _k1_kernel for the fused single-device
    form).  The bond-tensor blocks are formed from the replicated cores and
    discarded — only the gradient crosses the mesh."""
    f32 = jnp.float32
    le = le_ref[:]
    re = re_ref[:]
    phil = phil_ref[:]
    phir = phir_ref[:]
    y1h = y1h_ref[:]
    w = w_ref[:]

    L = _kron_batch_major(le, phil)

    if not forward:
        A2 = left_ref[:].reshape(chi * d, chi)

    yhat = []
    for c in range(C):
        acc = None
        if forward:
            Cc2 = left_ref[c]                         # [chi*d, chi]
        for k in range(d):
            if forward:
                Bk = right_ref[k]
                BT_ck = jnp.dot(Cc2, Bk, preferred_element_type=f32)
            else:
                Cck = right_ref[c, :, k, :]
                BT_ck = jnp.dot(A2, Cck, preferred_element_type=f32)
            t_ck = jnp.dot(L, BT_ck, preferred_element_type=f32)
            R_k = phir[:, k:k + 1] * re
            part = jnp.sum(t_ck * R_k, axis=1, keepdims=True)
            acc = part if acc is None else acc + part
        yhat.append(acc)

    if loss == "KLD":
        y_true = sum(yhat[c] * y1h[:, c:c + 1] for c in range(C))
        u = w / y_true
    else:
        s = jnp.exp(gls_ref[:])
        ws = w * s

    for c in range(C):
        if loss == "KLD":
            wc = y1h[:, c:c + 1] * u
        else:
            wc = (yhat[c] * s - y1h[:, c:c + 1]) * ws
        for k in range(d):
            R_k = phir[:, k:k + 1] * re
            G_ck = jnp.dot(L.T, R_k * wc, preferred_element_type=f32)
            g_ref[c, :, k, :] = -G_ck if loss == "KLD" else G_ck


def _k1_update_kernel(eta_ref, left_ref, right_ref, g_ref, v0_ref,
                      bt_ref, y_ref, *, C: int, chi: int, d: int,
                      forward: bool, emit_y: bool = True, q: int = 1,
                      orth: str = "qr", bbopt: str = "TSGO"):
    """Optimiser step (TSGO or GD) + post-normalization + warm power step
    against the GLOBAL (psummed) gradient.  All operands replicated; every
    device computes the same result."""
    f32 = jnp.float32
    eta = eta_ref[0, 0]
    V0 = v0_ref[:]

    if not forward:
        A2 = left_ref[:].reshape(chi * d, chi)

    if bbopt == "TSGO":
        g2 = jnp.zeros((), f32)
        for c in range(C):
            for k in range(d):
                G_ck = g_ref[c, :, k, :]
                g2 = g2 + jnp.sum(G_ck * G_ck)
        step = eta * jax.lax.rsqrt(jnp.maximum(g2, jnp.finfo(f32).tiny))
    else:
        step = eta

    BT = [[None] * d for _ in range(C)]
    b2 = jnp.zeros((), f32)
    for c in range(C):
        if forward:
            Cc2 = left_ref[c]                         # [chi*d, chi]
        for k in range(d):
            if forward:
                BT_ck = jnp.dot(Cc2, right_ref[k],
                                preferred_element_type=f32)
            else:
                BT_ck = jnp.dot(A2, right_ref[c, :, k, :],
                                preferred_element_type=f32)
            BT_ck = BT_ck - step * g_ref[c, :, k, :]
            BT[c][k] = BT_ck
            b2 = b2 + jnp.sum(BT_ck * BT_ck)
    bn = jax.lax.rsqrt(jnp.maximum(b2, jnp.finfo(f32).tiny))
    for c in range(C):
        for k in range(d):
            BT[c][k] = BT[c][k] * bn
            bt_ref[c, :, k, :] = BT[c][k]

    _power_step_tail(BT, V0, y_ref, C=C, chi=chi, d=d, forward=forward,
                     emit_y=emit_y, q=q, orth=orth)


def _k1_grad_call(left, right, le, re, phil, phir, y1h, w, gls, *,
                  C, chi, d, forward, loss="KLD", est=None):
    f32 = jnp.float32
    if forward:
        left = left.reshape(C, chi * d, chi)
        right = right.transpose(1, 0, 2)
    kern = functools.partial(_k1_grad_kernel, C=C, chi=chi, d=d,
                             forward=forward, loss=loss)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        in_specs=[_vmem()] * 9,
        out_specs=_vmem(),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(left, right, le, re, phil, phir, y1h, w, gls)


def _k1_update_call(eta, left, right, G, V0, *, C, chi, d, forward,
                    emit_y=True, q=1, orth="qr", bbopt="TSGO", est=None):
    f32 = jnp.float32
    if forward:
        left = left.reshape(C, chi * d, chi)
        right = right.transpose(1, 0, 2)
    out_shape = (
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
    )
    kern = functools.partial(_k1_update_kernel, C=C, chi=chi, d=d,
                             forward=forward, emit_y=emit_y, q=q, orth=orth,
                             bbopt=bbopt)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_smem_scalar()] + [_vmem()] * 4,
        out_specs=(_vmem(), _vmem()),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(eta, left, right, G, V0)


# --------------------------------------------------------------------------
# K2: Rayleigh quotients + cutoff mask + split factors + env step
# --------------------------------------------------------------------------

def _k2_project_mask(cutoff, max_rank, bt_at, Q, *, C: int, chi: int,
                     d: int, forward: bool):
    """Shared K2 math: project the bond tensor onto Q, compute direction
    energies, and build the ITensor-style cutoff masks.  Returns
    (B, mask_row [1, chi], mask_col [chi, 1], Qm) where B is the projected
    blocks (per-class [chi*d, keep] backward; per-class-per-k [keep, chi]
    forward) and Qm = Q * mask_row."""
    f32 = jnp.float32
    # ---- project + energies (wv kept as a [1, chi] row) --------------------
    if not forward:
        B = [None] * C                              # US_c [chi*d, keep]
        wv = jnp.zeros((1, chi), f32)
        for c in range(C):
            acc = None
            for k in range(d):
                Qk = Q[k * chi:(k + 1) * chi, :]    # [chi, keep]
                term = jnp.dot(bt_at(c, k), Qk,
                               preferred_element_type=f32)
                acc = term if acc is None else acc + term
            B[c] = acc
            wv = wv + jnp.sum(acc * acc, axis=0, keepdims=True)
    else:
        B = [[None] * d for _ in range(C)]          # SVh_ck [keep, chi]
        wv_c = jnp.zeros((chi, 1), f32)             # per-direction rowsums
        for c in range(C):
            for k in range(d):
                B_ck = jnp.dot(Q.T, bt_at(c, k),
                               preferred_element_type=f32)
                B[c][k] = B_ck
                wv_c = wv_c + jnp.dot(B_ck * B_ck, jnp.ones((chi, 1), f32),
                                      preferred_element_type=f32)
        eye0 = (jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)
                ).astype(f32)
        wv = jnp.dot(jnp.ones((1, chi), f32), eye0 * wv_c,
                     preferred_element_type=f32)    # [1, chi]

    mask_row, mask_col = _pairwise_cutoff_mask(wv, cutoff, max_rank, chi)
    return B, mask_row, mask_col, Q * mask_row


def _pairwise_cutoff_mask(wv, cutoff, max_rank, chi: int):
    """ITensor cutoff without a sort — shared by the real/complex K2 and
    the ritz kernels.  Direction i is dropped iff the total energy of all
    directions with w_j <= w_i is <= cutoff * total (the sorted-suffix
    rule, O(chi^2)).  Ties are broken by index — j counts toward i's
    suffix iff w_j < w_i, or w_j == w_i and j >= i — which reproduces
    exactly the stable descending sort the XLA paths use (_trunc_mask
    over argsort(-w)), so both paths truncate identically even on
    degenerate spectra AND on unsorted inputs (the jacobi rotation's
    round order).  Mosaic is picky about 1-D vectors / row<->column
    relayouts, so the whole computation stays 2-D via matmuls with
    ones/eye.  wv: [1, chi] row of direction energies.  Returns
    (mask_row [1, chi], mask_col [chi, 1])."""
    f32 = jnp.float32
    ones_c = jnp.ones((chi, 1), f32)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)).astype(f32)
    W_row = jnp.dot(ones_c, wv, preferred_element_type=f32)   # rows = wv
    wv_col = jnp.dot(W_row * eye, ones_c, preferred_element_type=f32)
    W_col = jnp.dot(wv_col, jnp.ones((1, chi), f32),
                    preferred_element_type=f32)               # cols = wv
    I_idx = jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
    J_idx = jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)
    leq = ((W_row < W_col)
           | ((W_row == W_col) & (J_idx >= I_idx))).astype(f32)  # [chi, chi]
    s_col = jnp.sum(leq * W_row, axis=1, keepdims=True)       # [chi, 1]
    total = jnp.sum(wv)
    # runtime rank cap (shape-polymorphic trials): direction i's 0-based
    # sorted position is chi - cnt_i where cnt_i counts its suffix incl.
    # itself; keep iff position < max_rank  <=>  cnt_i > chi - max_rank
    cnt_col = jnp.sum(leq, axis=1, keepdims=True)             # [chi, 1]
    mask_col = ((s_col > cutoff * total) & (wv_col > 0)
                & (cnt_col > jnp.float32(chi) - max_rank)).astype(f32)
    mask_row = jnp.dot(jnp.ones((1, chi), f32), eye * mask_col,
                       preferred_element_type=f32)            # [1, chi]
    return mask_row, mask_col


def _k2_emit(B, mask_row, mask_col, Qm, center_ref, core_ref, *,
             C: int, chi: int, d: int, forward: bool):
    """Write the split factors in their final core layouts."""
    if not forward:
        for c in range(C):
            center_ref[c] = (B[c] * mask_row).reshape(chi, d, chi)
        for k in range(d):
            core_ref[:, k, :] = Qm[k * chi:(k + 1) * chi, :].T  # [keep, chi]
    else:
        for c in range(C):
            for k in range(d):
                center_ref[c, :, k, :] = B[c][k] * mask_col
        core_ref[:] = Qm.reshape(chi, d, chi)       # [chi(l), d, keep]


def _k2_env_vals(Qm, env, phi, envls, *, chi: int, d: int, forward: bool):
    """Advance the (local) environment through the new isometry, with
    per-sample renormalization and log-scale accumulation.  Value-level
    core shared by the single-bond kernels (ref-wrapping below) and the
    multi-bond block kernel (env carried as live values)."""
    f32 = jnp.float32
    N = env.shape[0]
    v2 = jnp.zeros((N, chi), f32)
    if not forward:
        # v'[n, m] = sum_{k,b} V[m,k,b] phi_r[n,k] re[n,b]
        for k in range(d):
            tmp_k = phi[:, k:k + 1] * env           # [N, chi]
            v2 = v2 + jnp.dot(tmp_k, Qm[k * chi:(k + 1) * chi, :],
                              preferred_element_type=f32)
    else:
        # v'[n, m] = sum_{a,i} le[n,a] phi_l[n,i] U[a,i,m]
        tmp = _kron_batch_major(env, phi)           # [N, chi*d]
        v2 = jnp.dot(tmp, Qm, preferred_element_type=f32)
    nrm = jnp.sqrt(jnp.sum(v2 * v2, axis=1, keepdims=True))
    safe = jnp.maximum(nrm, jnp.finfo(f32).tiny)
    env2 = v2 / jnp.where(nrm > 0, safe, 1.0)
    envls2 = envls + jnp.where(nrm > 0, jnp.log(safe), 0.0)
    return env2, envls2


def _k2_env_advance(Qm, env, phi, envls_ref, env2_ref, envls2_ref, *,
                    chi: int, d: int, forward: bool):
    env2, envls2 = _k2_env_vals(Qm, env, phi, envls_ref[:],
                                chi=chi, d=d, forward=forward)
    env2_ref[:] = env2
    envls2_ref[:] = envls2


def _k2_kernel(cutoff_ref, bt_ref, q_ref, env_ref, envls_ref, phi_ref,
               center_ref, core_ref, env2_ref, envls2_ref, *,
               C: int, chi: int, d: int, forward: bool):
    """Project the updated bond tensor onto the orthonormal subspace Q,
    apply the ITensor-style relative cutoff, emit split factors in final
    core layouts, and advance the environment through the new isometry.

    backward: Q [d*chi, chi] right-subspace (k-blocked rows);
              center[c] = US [chi, d, keep], core = V [keep, d, chi],
              env advance = right step with (re, phi_r).
    forward:  Q [chi*d, chi] left-subspace; center[c] = SVh [keep, d, chi],
              core = U [chi, d, keep], env advance = left step with
              (le, phi_l)."""
    B, mask_row, mask_col, Qm = _k2_project_mask(
        cutoff_ref[0, 0], cutoff_ref[0, 1],
        lambda c, k: bt_ref[c, :, k, :], q_ref[:], C=C, chi=chi,
        d=d, forward=forward)
    _k2_emit(B, mask_row, mask_col, Qm, center_ref, core_ref,
             C=C, chi=chi, d=d, forward=forward)
    _k2_env_advance(Qm, env_ref[:], phi_ref[:], envls_ref, env2_ref,
                    envls2_ref, chi=chi, d=d, forward=forward)


def _k2_split_kernel(cutoff_ref, bt_ref, q_ref, center_ref, core_ref,
                     qm_ref, *, C: int, chi: int, d: int, forward: bool):
    """Replicated half of K2 for the dp path: split factors + masked
    isometry Qm (consumed by _k2_env_kernel on each shard)."""
    B, mask_row, mask_col, Qm = _k2_project_mask(
        cutoff_ref[0, 0], cutoff_ref[0, 1],
        lambda c, k: bt_ref[c, :, k, :], q_ref[:], C=C, chi=chi,
        d=d, forward=forward)
    _k2_emit(B, mask_row, mask_col, Qm, center_ref, core_ref,
             C=C, chi=chi, d=d, forward=forward)
    qm_ref[:] = Qm


def _k2_env_kernel(qm_ref, env_ref, envls_ref, phi_ref, env2_ref,
                   envls2_ref, *, chi: int, d: int, forward: bool):
    """Local half of K2 for the dp path: advance this shard's environments
    through the replicated masked isometry."""
    _k2_env_advance(qm_ref[:], env_ref[:], phi_ref[:], envls_ref, env2_ref,
                    envls2_ref, chi=chi, d=d, forward=forward)


def _k2_call(cutoff, BT, Q, env, env_ls, phi, *, C, chi, d, forward, est=None):
    f32 = jnp.float32
    N = env.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center blocks
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # new core
        jax.ShapeDtypeStruct((N, chi), f32),           # env'
        jax.ShapeDtypeStruct((N, 1), f32),             # env_ls'
    )
    kern = functools.partial(_k2_kernel, C=C, chi=chi, d=d, forward=forward)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_smem_scalar()] + [_vmem()] * 5,
        out_specs=tuple(_vmem() for _ in range(4)),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(cutoff, BT, Q, env, env_ls, phi)


def _k2_split_call(cutoff, BT, Q, *, C, chi, d, forward, est=None):
    f32 = jnp.float32
    nq = Q.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center blocks
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # new core
        jax.ShapeDtypeStruct((nq, chi), f32),          # Qm
    )
    kern = functools.partial(_k2_split_kernel, C=C, chi=chi, d=d,
                             forward=forward)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_smem_scalar()] + [_vmem()] * 2,
        out_specs=tuple(_vmem() for _ in range(3)),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(cutoff, BT, Q)


def _k2_env_call(Qm, env, env_ls, phi, *, chi, d, forward, est=None):
    f32 = jnp.float32
    N = env.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((N, chi), f32),
        jax.ShapeDtypeStruct((N, 1), f32),
    )
    kern = functools.partial(_k2_env_kernel, chi=chi, d=d, forward=forward)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_vmem()] * 4,
        out_specs=(_vmem(), _vmem()),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(Qm, env, env_ls, phi)


# --------------------------------------------------------------------------
# K12: the whole bond step as ONE kernel (r4, orth="ns" route)
#
# With the QR replaced by the in-kernel NS polar there is no XLA op left
# between K1 and K2, so the single-device bond step fuses into one
# pallas_call: the bond tensor lives and dies in VMEM (never written to
# HBM — saves 2x its size in HBM traffic per bond) and the per-bond
# launch count halves.  Applies whenever no orthogonalization has to
# happen OUTSIDE the kernel: orth="ns" refresh bonds and (any-orth)
# frozen bonds.  The dp path keeps its split kernels (the gradient psum
# must run between them).
# --------------------------------------------------------------------------

def _k12_kernel(scal_ref, left_ref, right_ref, le_ref, re_ref, phil_ref,
                phir_ref, y1h_ref, w_ref, gls_ref, v0_ref, envls_ref,
                center_ref, core_ref, env2_ref, envls2_ref, y_ref, *,
                C: int, chi: int, d: int, forward: bool,
                emit_y: bool, q: int, orth: str, loss: str = "KLD",
                bbopt: str = "TSGO"):
    """One-kernel bond step: _k1_body (BT stays a live VMEM value) then
    the K2 projection/cutoff/emit/env-advance against it.  scal_ref packs
    [eta, cutoff, max_rank] in SMEM; gls_ref carries the TOTAL env
    log-scales for the MSE gradient (zeros under KLD)."""
    left_at, right_at = _ref_accessors(left_ref, right_ref, chi, d, forward)
    BT = _k1_body(scal_ref[0, 0], left_at, right_at, le_ref[:], re_ref[:],
                  phil_ref[:], phir_ref[:], y1h_ref[:], w_ref[:], v0_ref[:],
                  y_ref, C=C, chi=chi, d=d, forward=forward, emit_y=emit_y,
                  q=q, orth=orth, loss=loss, bbopt=bbopt, gls=gls_ref[:])
    B, mask_row, mask_col, Qm = _k2_project_mask(
        scal_ref[0, 1], scal_ref[0, 2], lambda c, k: BT[c][k], y_ref[:],
        C=C, chi=chi, d=d, forward=forward)
    _k2_emit(B, mask_row, mask_col, Qm, center_ref, core_ref,
             C=C, chi=chi, d=d, forward=forward)
    env = le_ref[:] if forward else re_ref[:]
    phi = phil_ref[:] if forward else phir_ref[:]
    _k2_env_advance(Qm, env, phi, envls_ref, env2_ref, envls2_ref,
                    chi=chi, d=d, forward=forward)


def _k12_call(scal, left, right, le, re, phil, phir, y1h, w, gls, V0,
              env_ls, *, C, chi, d, forward, emit_y, q, orth,
              loss="KLD", bbopt="TSGO", est=None):
    f32 = jnp.float32
    N = le.shape[0]
    if forward:
        left = left.reshape(C, chi * d, chi)
        right = right.transpose(1, 0, 2)
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center blocks
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # new core
        jax.ShapeDtypeStruct((N, chi), f32),           # env'
        jax.ShapeDtypeStruct((N, 1), f32),             # env_ls'
        jax.ShapeDtypeStruct((chi * d, chi), f32),     # Q (subspace cache)
    )
    kern = functools.partial(_k12_kernel, C=C, chi=chi, d=d, forward=forward,
                             emit_y=emit_y, q=q, orth=orth, loss=loss,
                             bbopt=bbopt)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_smem_scalar()] + [_vmem()] * 11,
        out_specs=tuple(_vmem() for _ in range(5)),
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(scal, left, right, le, re, phil, phir, y1h, w, gls, V0, env_ls)


# --------------------------------------------------------------------------
# K12m: a BLOCK of consecutive bond steps as ONE kernel (r4).
#
# Even with K12 the sweep issues one kernel per bond, and the per-launch
# skeleton (~tens of us on the remote TPU service) dominates at small chi.
# The sequential dependency between bonds is only through the center, the
# environment, and the subspace cache — all of which fit VMEM — so a block
# of Bb bonds runs as one pallas_call: the center carries through a VMEM
# scratch ref (read back with the same strided [c, :, k, :] pattern the
# single-bond kernel uses on its HBM input ref), the environment and
# log-scales carry as live values, and per-bond outputs (new cores,
# environments, subspace caches) land in Bb-blocked output refs.  Same
# eligibility as K12 (orth="ns" refresh bonds / frozen bonds, no dp) plus
# a block footprint gate; remainder bonds (Bb does not divide T-1) run
# through the single-bond K12.
# --------------------------------------------------------------------------

def block_footprint(C: int, chi: int, d: int, N: int, Bb: int) -> int:
    """Estimated VMEM residents of the Bb-bond block kernel: the merged
    single-bond working set (k12_footprint), the center scratch carry, and
    the Bb-blocked operand/output refs."""
    f = 4
    per_bond = (3 * chi * d * chi       # lhs + new core + subspace cache
                + 2 * N * chi           # env operand + env output
                + 2 * N * d + N) * f    # phis + log-scales
    return (k12_footprint(C, chi, d, N)
            + C * chi * d * chi * f     # center scratch
            + Bb * per_bond)


def _merge_center_rows(cs_ref, c, chi, d):
    """Merged [chi*d, chi] class slice (rows (a, i), i minor) of the
    standard-layout center scratch, via exact one-hot scatter matmuls:
    merged[a*d+i, m] = cs[c, a, i, m].  Mosaic rejects per-class ref-slice
    reshapes at large chi (scripts/k1_fwd_bisect.py), and strided row
    writes don't exist — the E_i products are exact (0/1 weights), so the
    forward block carry is bit-identical to the pre-merged HBM input the
    single-bond kernel reads."""
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (chi * d, chi), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chi * d, chi), 1)
    acc = None
    for i in range(d):
        Ei = (rows == cols * d + i).astype(f32)       # [chi*d, chi] one-hot
        term = jnp.dot(Ei, cs_ref[c, :, i, :], preferred_element_type=f32)
        acc = term if acc is None else acc + term
    return acc


def _k12m_kernel(scal_ref, lhs_blk_ref, envx_blk_ref, phil_blk_ref,
                 phir_blk_ref, y1h_ref, w_ref, v0_blk_ref, center0_ref,
                 env0_ref, envls0_ref,
                 center_out_ref, v_blk_ref, env_blk_ref, envls_blk_ref,
                 qv_blk_ref, cs_ref, y_ref, *,
                 Bb: int, C: int, chi: int, d: int, forward: bool,
                 emit_y: bool, q: int, orth: str, bbopt: str = "TSGO"):
    """Bb consecutive bond steps (statically unrolled): per bond the K1
    body against the carried center (input ref for bond 0, VMEM scratch
    after), the K2 projection/cutoff/emit, and the env advance on live
    values.

    backward: lhs_blk = merged A2 per bond [Bb, chi*d, chi], envx_blk =
    LE[j] per bond, env carry = the right environment.
    forward:  lhs_blk = B cores k-leading [Bb, d, chi, chi], envx_blk =
    RE[j+2] per bond, env carry = the left environment; the merged center
    class slices are rebuilt from scratch via _merge_center_rows."""
    eta = scal_ref[0, 0]
    cutoff = scal_ref[0, 1]
    mr = scal_ref[0, 2]
    y1h = y1h_ref[:]
    w = w_ref[:]
    env = env0_ref[:]
    envls = envls0_ref[:]
    for b in range(Bb):
        phil = phil_blk_ref[b]
        phir = phir_blk_ref[b]
        if forward:
            le, re = env, envx_blk_ref[b]
            right_at = lambda k, _b=b: lhs_blk_ref[_b, k]          # noqa: E731
            if b == 0:
                left_at = lambda c: center0_ref[c]                 # noqa: E731
            else:
                left_at = lambda c: _merge_center_rows(cs_ref, c, chi, d)  # noqa: E731
        else:
            le, re = envx_blk_ref[b], env
            left_at = lambda _b=b: lhs_blk_ref[_b]                 # noqa: E731
            if b == 0:
                right_at = lambda c, k: center0_ref[c, :, k, :]    # noqa: E731
            else:
                right_at = lambda c, k: cs_ref[c, :, k, :]         # noqa: E731
        BT = _k1_body(eta, left_at, right_at, le, re, phil, phir, y1h, w,
                      v0_blk_ref[b], y_ref, C=C, chi=chi, d=d,
                      forward=forward, emit_y=emit_y, q=q, orth=orth,
                      bbopt=bbopt)
        Q = y_ref[:]
        Bv, mask_row, mask_col, Qm = _k2_project_mask(
            cutoff, mr, lambda c, k: BT[c][k], Q, C=C, chi=chi, d=d,
            forward=forward)
        if not forward:
            for c in range(C):
                cs_ref[c] = (Bv[c] * mask_row).reshape(chi, d, chi)
            for k in range(d):
                v_blk_ref[b, :, k, :] = Qm[k * chi:(k + 1) * chi, :].T
        else:
            for c in range(C):
                for k in range(d):
                    cs_ref[c, :, k, :] = Bv[c][k] * mask_col
            v_blk_ref[b] = Qm.reshape(chi, d, chi)
        qv_blk_ref[b] = Q
        env, envls = _k2_env_vals(Qm, env, phil if forward else phir,
                                  envls, chi=chi, d=d, forward=forward)
        env_blk_ref[b] = env
        envls_blk_ref[b] = envls
    for c in range(C):
        center_out_ref[c] = cs_ref[c]


def _k12m_call(scal, lhs_blk, envx_blk, phil_blk, phir_blk, y1h, w, v0_blk,
               center0, env0, envls0, *, Bb, C, chi, d, forward, emit_y, q,
               orth, bbopt="TSGO", est=None):
    f32 = jnp.float32
    N = env0.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center after block
        jax.ShapeDtypeStruct((Bb, chi, d, chi), f32),  # new cores
        jax.ShapeDtypeStruct((Bb, N, chi), f32),       # envs
        jax.ShapeDtypeStruct((Bb, N, 1), f32),         # env log-scales
        jax.ShapeDtypeStruct((Bb, chi * d, chi), f32),  # subspace caches
    )
    kern = functools.partial(_k12m_kernel, Bb=Bb, C=C, chi=chi, d=d,
                             forward=forward, emit_y=emit_y, q=q, orth=orth,
                             bbopt=bbopt)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[_smem_scalar()] + [_vmem()] * 10,
        out_specs=tuple(_vmem() for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((C, chi, d, chi), f32),
                        pltpu.VMEM((chi * d, chi), f32)],
        interpret=_INTERPRET,
        **_compiler_kw(est),
    )(scal, lhs_blk, envx_blk, phil_blk, phir_blk, y1h, w, v0_blk,
      center0, env0, envls0)


def bond_block_steps(A_blk, center_c, envx_blk, env0, env_ls0, phil_blk,
                     phir_blk, y1h, w, V0_blk, eta, cutoff, *,
                     forward: bool, refresh: bool = True,
                     power_iters: int = 1, orth: str = "ns", max_rank=None,
                     bbopt: str = "TSGO"):
    """Bb consecutive bond updates as ONE kernel (see _k12m_kernel).

    A_blk [Bb, chi, d, chi]: the static cores in update order (backward:
    cores[j], j descending; forward: cores[j+1], j ascending).  envx_blk
    [Bb, N, chi]: the precomputed opposite-side environments per bond
    (backward: LE[j]; forward: RE[j+2]).  env0/env_ls0: the advancing
    environment carry entering the block.  Same eligibility as the K12
    route in bond_step: orth="ns" refresh bonds or frozen bonds, no dp.

    Returns (center', V_blk, env_blk, env_ls_blk, Q_blk) with per-bond
    emissions Bb-blocked in update order."""
    Bb, chi, d, _ = A_blk.shape
    C = center_c.shape[0]
    est = block_footprint(C, chi, d, env0.shape[0], Bb)
    mr = (jnp.float32(chi) if max_rank is None
          else max_rank.astype(jnp.float32))
    scal = jnp.stack([eta.astype(jnp.float32),
                      cutoff.astype(jnp.float32), mr])[None, :]
    if forward:
        lhs = A_blk.transpose(0, 2, 1, 3)           # [Bb, d, chi, chi]
        center0 = center_c.reshape(C, chi * d, chi)  # free relayout in XLA
    else:
        lhs = A_blk.reshape(Bb, chi * d, chi)
        center0 = center_c
    center2, V_blk, env_blk, envls_blk, q_blk = _k12m_call(
        scal, lhs, envx_blk, phil_blk, phir_blk, y1h, w[:, None], V0_blk,
        center0, env0, env_ls0[:, None], Bb=Bb, C=C, chi=chi, d=d,
        forward=forward, emit_y=refresh, q=power_iters, orth=orth,
        bbopt=bbopt, est=est)
    return center2, V_blk, env_blk, envls_blk[:, :, 0], q_blk


# --------------------------------------------------------------------------
# public bond step
# --------------------------------------------------------------------------

#: Smallest batch tile the N-streaming route will propose (rows).  Below
#: this the per-tile kernels are launch-overhead-bound and XLA wins.
STREAM_MIN_TILE = 256


def stream_tile_for(C: int, chi: int, d: int, N: int,
                    factor: int = 1) -> Optional[int]:
    """Batch tile size for the N-streaming bond-step route, or None.

    None means either (a) the full-N working set already fits the fused
    kernels' limits (no streaming needed) or (b) streaming cannot help —
    the batch-independent residents (the [C, chi*d, d, chi] bond tensor +
    subspace buffers) alone exceed the two-kernel ceiling, which is the
    large-chi compile cliff (docs/tpu_performance.md), not a batch-size
    problem.  Otherwise: the largest multiple of 256 such that the
    per-tile working set fits SPLIT_TAIL_FOOTPRINT (the proven two-kernel
    range).  ``factor=2`` for the complex pair kernels."""
    limit = MAX_FOOTPRINT if factor > 1 else SPLIT_MAX_FOOTPRINT
    if factor * kernel_footprint(C, chi, d, N) <= limit:
        return None
    fixed = factor * kernel_footprint(C, chi, d, 0)
    if fixed > SPLIT_TAIL_FOOTPRINT:
        return None
    per_row = factor * (kernel_footprint(C, chi, d, 1)
                        - kernel_footprint(C, chi, d, 0))
    nt = int((SPLIT_TAIL_FOOTPRINT - fixed) // (per_row * STREAM_MIN_TILE))
    while (nt >= 1 and factor * kernel_footprint(C, chi, d,
                                                 nt * STREAM_MIN_TILE)
           > SPLIT_TAIL_FOOTPRINT):
        nt -= 1
    if nt < 1:
        return None
    return min(STREAM_MIN_TILE * nt,
               STREAM_MIN_TILE * -(-N // STREAM_MIN_TILE))


def _pad_rows(x, n_to: int):
    """Pad axis 0 to n_to rows by repeating row 0 (valid feature values;
    the pad rows carry w=0 so they contribute nothing to the gradient,
    and their env outputs are sliced away by the caller)."""
    n = x.shape[0]
    if n == n_to:
        return x
    reps = jnp.broadcast_to(x[:1], (n_to - n,) + x.shape[1:])
    return jnp.concatenate([x, reps], axis=0)


def _bond_step_streamed(A_or_B, center_c, le, re, env_ls, phil, phir, y1h,
                        w, V0, eta, cutoff, *, forward: bool, refresh: bool,
                        power_iters: int, orth: str, max_rank,
                        stream_tile: int, loss: str = "KLD",
                        bbopt: str = "TSGO", opp_ls=None):
    """N-streaming bond step: the batch axis is processed in
    ``stream_tile``-row tiles so the batch-resident VMEM terms become a
    tile size instead of a ceiling (SURVEY §7.2 / r4 VERDICT task 5 —
    production batches are orders of magnitude larger than the UCR sets).

    Same decomposition as the dp path (which is proven bit-compatible):
    per-tile LOCAL gradients through _k1_grad_call accumulated by a
    lax.scan (the dp psum becomes the scan sum), ONE _k1_update_call (+
    tail) and ONE _k2_split_call on the accumulated gradient, then
    per-tile env advances through _k2_env_call.  N is padded to a tile
    multiple with w=0 rows; their gradient contribution is exactly zero
    and their env rows are dropped."""
    C, chi, d, _ = center_c.shape
    N = le.shape[0]
    Nt = stream_tile
    nt = -(-N // Nt)
    est = kernel_footprint(C, chi, d, Nt)
    eta2 = jnp.reshape(eta.astype(jnp.float32), (1, 1))
    mr = jnp.float32(chi) if max_rank is None else max_rank.astype(jnp.float32)
    cut2 = jnp.stack([cutoff.astype(jnp.float32), mr])[None, :]

    if forward:
        left, right = center_c, A_or_B
    else:
        left, right = A_or_B, center_c

    def tiles(x):
        return _pad_rows(x, nt * Nt).reshape((nt, Nt) + x.shape[1:])

    le_t, re_t = tiles(le), tiles(re)
    phil_t, phir_t = tiles(phil), tiles(phir)
    y1h_t = tiles(y1h)
    w_t = tiles(jnp.concatenate([w, jnp.zeros((nt * Nt - N,), w.dtype)])
                if nt * Nt > N else w)
    ls_t = tiles(env_ls[:, None])
    total_ls = (env_ls if opp_ls is None else env_ls + opp_ls)
    gls_t = tiles(total_ls[:, None]) if loss == "MSE" else \
        jnp.zeros_like(ls_t)

    def grad_acc(G, tile):
        le_i, re_i, pl_i, pr_i, y_i, w_i, gls_i = tile
        Gi = _k1_grad_call(left, right, le_i, re_i, pl_i, pr_i, y_i,
                           w_i[:, None], gls_i, C=C, chi=chi, d=d,
                           forward=forward, loss=loss, est=est)
        return G + Gi, None

    G0 = jnp.zeros((C, chi * d, d, chi), jnp.float32)
    G, _ = jax.lax.scan(grad_acc, G0,
                        (le_t, re_t, phil_t, phir_t, y1h_t, w_t, gls_t))

    split_tail = refresh and est > SPLIT_TAIL_FOOTPRINT
    emit = refresh and not split_tail
    BT, Y = _k1_update_call(eta2, left, right, G, V0, C=C, chi=chi, d=d,
                            forward=forward, emit_y=emit,
                            q=power_iters, orth=orth, bbopt=bbopt, est=est)
    if split_tail:
        Y = V0
        for _ in range(power_iters):
            Y = _k1_tail_call(BT, Y, C=C, chi=chi, d=d, forward=forward,
                              q=1, orth=orth, est=est)
    if refresh:
        Q = Y if orth == "ns" else jnp.linalg.qr(Y)[0]
    else:
        Q = V0
    center2, core, Qm = _k2_split_call(cut2, BT, Q, C=C, chi=chi, d=d,
                                       forward=forward, est=est)
    env_t = le_t if forward else re_t
    phi_t = phil_t if forward else phir_t

    def env_tile(_, tile):
        env_i, ls_i, phi_i = tile
        return None, _k2_env_call(Qm, env_i, ls_i, phi_i, chi=chi, d=d,
                                  forward=forward, est=est)

    _, (env2_t, ls2_t) = jax.lax.scan(env_tile, None, (env_t, ls_t, phi_t))
    env2 = env2_t.reshape(nt * Nt, chi)[:N]
    env_ls2 = ls2_t.reshape(nt * Nt)[:N]
    return center2, core, env2, env_ls2, Q


def bond_step(A_or_B, center_c, le, re, env_ls, phil, phir, y1h, w, V0,
              eta, cutoff, *, forward: bool, refresh: bool = True,
              axis_name: str = None, power_iters: int = 1,
              orth: str = "qr", max_rank=None,
              stream_tile: Optional[int] = None, loss: str = "KLD",
              bbopt: str = "TSGO", opp_ls=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                         jnp.ndarray]:
    """One fused bond step (everything except the QR).

    ``loss`` ("KLD"/"MSE") and ``bbopt`` ("TSGO"/"GD") select the fused
    gradient/step variants (r5 — the eligibility widening of VERDICT r4
    weak #7).  The MSE gradient needs the TOTAL per-sample env log-scales:
    ``env_ls`` carries the advancing side's (as always, for the env
    advance), ``opp_ls`` [N] the opposite side's; their sum scales yhat
    back to true scale (ops/bond_update.py:79-99).

    le / re are the gradient's left/right environments for this bond.
    backward (forward=False): A_or_B = cores[j]; advances the *right*
    environment (re, env_ls) through the new V with phir.
    forward  (forward=True):  A_or_B = cores[j+1]; advances the *left*
    environment (le, env_ls) through the new U with phil.

    center_c: [C, chi, d, chi].  Returns (center_c', core', env', env_ls',
    Q') with center_c' in the same class-major layout.

    ``axis_name``: run the data-parallel variant for use inside shard_map
    over a dp mesh — batch operands (le/re/phil/phir/y1h/w/env_ls) are this
    shard's blocks, cores/center/V0 replicated.  The LOCAL gradient is
    computed per shard (K1a), psummed over ``axis_name`` (the one collective
    per bond update, SURVEY §2.3), and the update + split run redundantly on
    every device; each shard's environments advance locally.

    ``stream_tile``: process the batch axis in tiles of this many rows
    (the N-streaming route, :func:`_bond_step_streamed`) — for batches
    whose full-N working set exceeds the fused kernels' VMEM range.
    Mutually exclusive with ``axis_name`` (a dp shard's local batch that
    still overflows should shard wider instead)."""
    if stream_tile is not None:
        assert axis_name is None, "stream_tile is a single-device route"
        return _bond_step_streamed(
            A_or_B, center_c, le, re, env_ls, phil, phir, y1h, w, V0,
            eta, cutoff, forward=forward, refresh=refresh,
            power_iters=power_iters, orth=orth, max_rank=max_rank,
            stream_tile=stream_tile, loss=loss, bbopt=bbopt, opp_ls=opp_ls)
    C, chi, d, _ = center_c.shape
    est = kernel_footprint(C, chi, d, le.shape[0])
    eta2 = jnp.reshape(eta.astype(jnp.float32), (1, 1))
    mr = jnp.float32(chi) if max_rank is None else max_rank.astype(jnp.float32)
    # [cutoff, max_rank] share one SMEM scalar block
    cut2 = jnp.stack([cutoff.astype(jnp.float32), mr])[None, :]
    w2 = w[:, None]
    if loss == "MSE":
        gls = ((env_ls if opp_ls is None else env_ls + opp_ls)
               .astype(jnp.float32)[:, None])
    else:
        gls = jnp.zeros((le.shape[0], 1), jnp.float32)

    if forward:
        left, right = center_c, A_or_B
    else:
        left, right = A_or_B, center_c

    # Single-kernel route: when nothing has to run OUTSIDE the kernel
    # between K1 and K2 (orth="ns" refresh bonds; frozen bonds under any
    # orth) and the WHOLE merged working set (k12_footprint — K1 + tail +
    # K2) fits the monolith range, the bond step is ONE pallas_call and
    # the bond tensor never touches HBM.
    est_k12 = k12_footprint(C, chi, d, le.shape[0])
    if (axis_name is None
            and est_k12 <= SPLIT_TAIL_FOOTPRINT
            and (not refresh or orth == "ns")):
        scal = jnp.stack([eta.astype(jnp.float32),
                          cutoff.astype(jnp.float32), mr])[None, :]
        # budget escalation keyed on the MERGED working set (the gate's
        # measure), not the two-kernel estimate — else shapes whose K1
        # footprint sits under the default budget but whose K12 set
        # exceeds it get no raised vmem_limit_bytes and Mosaic rejects
        center2, core, env2, env_ls2, Q = _k12_call(
            scal, left, right, le, re, phil, phir, y1h, w2, gls, V0,
            env_ls[:, None], C=C, chi=chi, d=d, forward=forward,
            emit_y=refresh, q=power_iters, orth=orth, loss=loss,
            bbopt=bbopt, est=est_k12)
        return center2, core, env2, env_ls2[:, 0], Q

    # Past SPLIT_TAIL_FOOTPRINT the in-kernel power tail crashes the Mosaic
    # compiler (chi=320: K1 with emit_y=False compiles, any kernel containing
    # the tail does not — /tmp probes, scripts/k1_fwd_bisect.py), so the tail
    # runs as its own kernel reading BT back from the K1 output.
    split_tail = refresh and est > SPLIT_TAIL_FOOTPRINT
    emit = refresh and not split_tail
    if axis_name is None:
        BT, Y = _k1_call(eta2, left, right, le, re, phil, phir, y1h, w2,
                         gls, V0, C=C, chi=chi, d=d, forward=forward,
                         emit_y=emit, q=power_iters, orth=orth, loss=loss,
                         bbopt=bbopt, est=est)
    else:
        G = _k1_grad_call(left, right, le, re, phil, phir, y1h, w2, gls,
                          C=C, chi=chi, d=d, forward=forward, loss=loss,
                          est=est)
        G = jax.lax.psum(G, axis_name)
        BT, Y = _k1_update_call(eta2, left, right, G, V0, C=C, chi=chi, d=d,
                                forward=forward, emit_y=emit,
                                q=power_iters, orth=orth, bbopt=bbopt,
                                est=est)
    if split_tail:
        # One tail kernel per power step (q=1 each, chained): the per-step
        # column normalization makes this identical to q steps in-kernel,
        # and the q-fold-unrolled tail exhausts the compile helper at
        # large chi (measured on the complex twin: scripts/k1c_bisect.py).
        # With orth="ns" each chained tail kernel carries its own
        # per-step revival + NS polar (subspace iteration), so the chain
        # output is already orthonormal.
        Y = V0
        for _ in range(power_iters):
            Y = _k1_tail_call(BT, Y, C=C, chi=chi, d=d, forward=forward,
                              q=1, orth=orth, est=est)
    if refresh:
        if orth == "ns":
            Q = Y          # orthonormalized in-kernel (_power_step_tail)
        else:
            Q, _ = jnp.linalg.qr(Y)
    else:
        # frozen sweep: V0 is the (orthonormal) basis cached at the last
        # refresh — split directly against it, no power step, no QR
        Q = V0
    env = le if forward else re
    phi = phil if forward else phir
    if axis_name is None:
        center2, core, env2, env_ls2 = _k2_call(
            cut2, BT, Q, env, env_ls[:, None], phi, C=C, chi=chi, d=d,
            forward=forward, est=est)
    else:
        center2, core, Qm = _k2_split_call(cut2, BT, Q, C=C, chi=chi, d=d,
                                           forward=forward, est=est)
        env2, env_ls2 = _k2_env_call(Qm, env, env_ls[:, None], phi,
                                     chi=chi, d=d, forward=forward, est=est)
    return center2, core, env2, env_ls2[:, 0], Q
