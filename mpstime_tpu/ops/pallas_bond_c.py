"""Complex (c64) Pallas TPU bond-step kernels — real-imag pair algebra.

The complex twin of ops/pallas_bond.py: the same K1 -> QR -> K2 fusion of
the DMRG bond step, with every complex operand carried as a PAIR of f32
arrays (re, im) and every complex contraction expanded into real MXU
matmuls (a complex matmul is 4 real matmuls).  Complex dtypes never enter
the kernels (or the axon host boundary — see utils/xfer.py): the pair
representation is produced once per sweep in training/sweep.py and carried
through the scan.

The QR between K1 and K2 is the stacked real-Householder embedding of
ops/decomp._qr_orth, operating directly on the pair (no complex
round-trip).

Conjugation bookkeeping (matches ops/bond_update.kld_loss_grad with the
sweep's operand conventions — phis arrive as conj(encoded states), and
the XLA path un-conjugates them at the call site):

  L1       = kron(conj(le), phi_c_l)          the yhat-side left factor
  R1_k     = phi_c_r[:, k] * conj(re)
  yhat_c   = sum_k rowsum( (L1 @ BT_ck) * R1_k )
  u        = w * y_true / |y_true|^2           ( = w / conj(y_true) )
  G_ck     = - conj(L1)^T ( conj(R1_k) * (y1h_c * u) )
  TSGO / renormalize as in the real kernel (norms over |.|^2)
  power    backward: MV_c = sum_k BT_ck V0_k ; Y_k += BT_ck^H MV_c
           forward:  Y   += sum_k BT_ck (BT_ck^H U0)
  K2 split backward: B_c = sum_k BT_ck Q_k ; V = Q^H (k-blocked)
           forward:  B_ck = Q^H BT_ck       ; U = Q
  env      backward: v' = sum_k (phi_c_r[:,k] * re) @ conj(Qm_k)
           forward:  v' = kron(le, phi_c_l) @ Qm
  (the env steps take the stored pre-conjugated states directly, like
  ops/env.env_step_*, and the new core's conjugation lands on Qm.)

Covers: complex64, KLD, TSGO, update_iters=1, rescale=(False, True),
svd_alg="randomized_warm" — single device AND data-parallel meshes (the
``axis_name`` dp split mirrors the real kernels': local gradient pair per
shard, one psum of (re, im) per bond, replicated update/split, local env
advance).  Reference complex surface: Encodings/bases.jl:8-74,
options.jl:117; loss semantics loss_functions.jl:302-432.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import pallas_bond as pb


# --------------------------------------------------------------------------
# pair algebra (operands are (re, im) tuples of f32 arrays)
# --------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _cconj(a):
    return (a[0], -a[1])


def _cdot(a, b):
    """Complex matmul of pairs: 4 real MXU matmuls."""
    return (_dot(a[0], b[0]) - _dot(a[1], b[1]),
            _dot(a[0], b[1]) + _dot(a[1], b[0]))


def _cdot_ct(a, b):
    """conj(a)^T @ b without materializing the negated imag part."""
    return (_dot(a[0].T, b[0]) + _dot(a[1].T, b[1]),
            _dot(a[0].T, b[1]) - _dot(a[1].T, b[0]))


def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cmul_real(a, s):
    return (a[0] * s, a[1] * s)


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _abs2(a):
    return a[0] * a[0] + a[1] * a[1]


def _ckron_batch(a, b):
    """Complex batched Kronecker [N,P] x [N,Q] -> [N,P*Q] via the real
    selection-matrix kron (pallas_bond._kron_batch_major) on components."""
    kr = pb._kron_batch_major
    return (kr(a[0], b[0]) - kr(a[1], b[1]),
            kr(a[0], b[1]) + kr(a[1], b[0]))


def _pairs(refs):
    """Group a flat ref list into (re, im) value pairs."""
    out = []
    for j in range(0, len(refs), 2):
        out.append((refs[j][:], refs[j + 1][:]))
    return out


def _ns_orth_pair_value(X):
    """Complex Newton-Schulz polar orthogonalization in pair algebra (twin
    of pallas_bond._ns_orth_value / ops/decomp.ns_orth, same coefficients
    and counts).  Every op is a pair matmul, so unlike the realified
    Householder embedding (_qr_orth_pair) it is complex-structure-
    preserving BY CONSTRUCTION — X^H X of a pair IS the complex Gram — and
    it fuses into the kernels, removing the [2*chi*d, 2*chi] XLA QR that
    dominated the complex refresh sweep (~60%% of it, docs/tpu_performance
    .md).  Applied per power step with eps-revival (subspace iteration) —
    see ops/decomp._NS_REVIVE for the measured failure modes of a single
    end-of-loop orthogonalization."""
    from .decomp import _NS_CUBIC, _NS_QA, _NS_QB, _NS_QC, _NS_QUINTIC
    f32 = jnp.float32
    nf2 = jnp.sum(_abs2(X)) * f32(1.0 + 1e-3) ** 2
    inv = jax.lax.rsqrt(jnp.maximum(nf2, jnp.finfo(f32).tiny))
    X = (X[0] * inv, X[1] * inv)
    # fori_loop bodies, NOT Python unrolls — see pallas_bond._ns_orth_value:
    # the unrolled NS tail is the kernel compile-resource driver (the q=3
    # pair unroll was the documented block-route and monolith-ceiling
    # limiter)
    def _quintic(_, X):
        G = _cdot_ct(X, X)                       # X^H X (Hermitian)
        G2 = _cdot(G, G)
        P = (_NS_QB * G[0] + _NS_QC * G2[0], _NS_QB * G[1] + _NS_QC * G2[1])
        XP = _cdot(X, P)
        return (_NS_QA * X[0] + XP[0], _NS_QA * X[1] + XP[1])

    def _cubic(_, X):
        G = _cdot_ct(X, X)
        XG = _cdot(X, G)
        return (1.5 * X[0] - 0.5 * XG[0], 1.5 * X[1] - 0.5 * XG[1])

    X = jax.lax.fori_loop(0, _NS_QUINTIC, _quintic, X)
    return jax.lax.fori_loop(0, _NS_CUBIC, _cubic, X)


# --------------------------------------------------------------------------
# K1: bond tensor + complex KLD gradient + TSGO + power step
# --------------------------------------------------------------------------

def _val_accessors(left, right, chi, d, forward):
    """Accessor pair over full-value operands (the single-bond kernels read
    their refs whole): backward left_at() -> merged A2 pair,
    right_at(c, k) -> center block pair; forward left_at(c) -> merged
    center class-slice pair, right_at(k) -> B block pair."""
    if forward:
        return (lambda c: (left[0][c].reshape(chi * d, chi),
                           left[1][c].reshape(chi * d, chi)),
                lambda k: (right[0][:, k, :], right[1][:, k, :]))
    return (lambda: (left[0].reshape(chi * d, chi),
                     left[1].reshape(chi * d, chi)),
            lambda c, k: (right[0][c, :, k, :], right[1][c, :, k, :]))


def _k1c_bt_grad(left_at, right_at, le, re, phil, phir, y1h, w, *,
                 C: int, chi: int, d: int, forward: bool):
    """Shared K1 math: bond-tensor blocks + the (local-batch) complex KLD
    gradient, both as pair lists BT[c][k] / G[c][k] of [chi*d, chi].
    Operands arrive through accessors (see _val_accessors; the multi-bond
    block kernel substitutes scratch-backed ones)."""
    L1 = _ckron_batch(_cconj(le), phil)          # [N, chi*d]

    if not forward:
        A2 = left_at()

    def bt_block(c, k):
        if forward:
            return _cdot(left_at(c), right_at(k))
        return _cdot(A2, right_at(c, k))

    def r1(k):
        return _cmul((phir[0][:, k:k + 1], phir[1][:, k:k + 1]), _cconj(re))

    # ---- yhat + u ----------------------------------------------------------
    BT = [[None] * d for _ in range(C)]
    yhat = []
    for c in range(C):
        acc = None
        for k in range(d):
            BT[c][k] = bt_block(c, k)
            t_ck = _cdot(L1, BT[c][k])                        # [N, chi]
            prod = _cmul(t_ck, r1(k))
            part = (jnp.sum(prod[0], axis=1, keepdims=True),
                    jnp.sum(prod[1], axis=1, keepdims=True))  # [N, 1]
            acc = part if acc is None else _cadd(acc, part)
        yhat.append(acc)

    y_true = (sum(yhat[c][0] * y1h[:, c:c + 1] for c in range(C)),
              sum(yhat[c][1] * y1h[:, c:c + 1] for c in range(C)))
    inv = w / _abs2(y_true)
    u = _cmul_real(y_true, inv)                   # = w / conj(y_true)

    # ---- gradient -----------------------------------------------------------
    G = [[None] * d for _ in range(C)]
    for c in range(C):
        wc = _cmul_real(u, y1h[:, c:c + 1])
        for k in range(d):
            rhs = _cmul(_cconj(r1(k)), wc)                    # [N, chi]
            g_ck = _cdot_ct(L1, rhs)                          # conj(L1)^T rhs
            G[c][k] = (-g_ck[0], -g_ck[1])
    return BT, G


def _k1c_tsgo_power(eta, BT, G, V0, bt_r, bt_i, y_r, y_i, *,
                    C: int, chi: int, d: int, forward: bool, emit_y: bool,
                    q: int = 1, orth: str = "qr"):
    """Shared K1 tail: TSGO step + post-normalization against the (local or
    psummed) gradient, then ``q`` warm power steps with per-column
    normalization between them (pair twin of pallas_bond._power_step_tail;
    complex encodings default to q=3 — docs/complex_split_oracle.md).
    Writes bt/y refs."""
    f32 = jnp.float32
    g2 = jnp.zeros((), f32)
    for c in range(C):
        for k in range(d):
            g2 = g2 + jnp.sum(_abs2(G[c][k]))
    gn = jax.lax.rsqrt(jnp.maximum(g2, jnp.finfo(f32).tiny))

    b2 = jnp.zeros((), f32)
    for c in range(C):
        for k in range(d):
            BT[c][k] = _csub(BT[c][k], _cmul_real(G[c][k], eta * gn))
            b2 = b2 + jnp.sum(_abs2(BT[c][k]))
    bn = jax.lax.rsqrt(jnp.maximum(b2, jnp.finfo(f32).tiny))
    for c in range(C):
        for k in range(d):
            BT[c][k] = _cmul_real(BT[c][k], bn)
            if bt_r is not None:     # None on the merged K12c route: the
                bt_r[c, :, k, :] = BT[c][k][0]   # bond tensor stays a live
                bt_i[c, :, k, :] = BT[c][k][1]   # VMEM value

    _k1c_power(BT, V0, y_r, y_i, C=C, chi=chi, d=d, forward=forward,
               emit_y=emit_y, q=q, orth=orth)
    return BT


def _k1c_power(BT, V0, y_r, y_i, *, C: int, chi: int, d: int,
               forward: bool, emit_y: bool, q: int,
               orth: str = "qr") -> None:
    """Warm power step(s) on the bond-tensor pair (the tail of
    _k1c_tsgo_power, also run standalone by _k1c_tail_kernel on the
    large-chi split route)."""
    f32 = jnp.float32
    if not emit_y:
        y_r[:] = V0[0]
        y_i[:] = V0[1]
        return
    from .decomp import _NS_REVIVE
    eps = f32(_NS_REVIVE)
    Y = V0
    for _ in range(q):
        if not forward:
            Yk = [None] * d
            for c in range(C):
                MV = None                              # [chi*d, chi]
                for k in range(d):
                    Yblk = (Y[0][k * chi:(k + 1) * chi, :],
                            Y[1][k * chi:(k + 1) * chi, :])
                    term = _cdot(BT[c][k], Yblk)
                    MV = term if MV is None else _cadd(MV, term)
                for k in range(d):
                    yk = _cdot_ct(BT[c][k], MV)        # BT^H MV
                    Yk[k] = yk if c == 0 else _cadd(Yk[k], yk)
            nrm2 = sum(jnp.sum(_abs2(Yk[k]), axis=0, keepdims=True)
                       for k in range(d))
            inv_n = jax.lax.rsqrt(jnp.maximum(nrm2, jnp.finfo(f32).tiny))
            for k in range(d):
                y_r[k * chi:(k + 1) * chi, :] = Yk[k][0] * inv_n
                y_i[k * chi:(k + 1) * chi, :] = Yk[k][1] * inv_n
            Yn = (y_r[:], y_i[:])
            if orth == "ns":
                Y = _ns_orth_pair_value((Yn[0] + eps * Y[0],
                                         Yn[1] + eps * Y[1]))
                y_r[:] = Y[0]
                y_i[:] = Y[1]
            elif orth == "tri":
                # QR-gauge refresh (no revival — twin of _warm_power's
                # qr branch: normalize, then orthogonalize)
                Y = _tri_newton_pair(Yn)
                y_r[:] = Y[0]
                y_i[:] = Y[1]
            else:
                Y = Yn
        else:
            Yn = (jnp.zeros((chi * d, chi), f32),
                  jnp.zeros((chi * d, chi), f32))
            for c in range(C):
                for k in range(d):
                    MtU = _cdot_ct(BT[c][k], Y)        # BT^H U0
                    Yn = _cadd(Yn, _cdot(BT[c][k], MtU))
            nrm2 = jnp.sum(_abs2(Yn), axis=0, keepdims=True)
            inv_n = jax.lax.rsqrt(jnp.maximum(nrm2, jnp.finfo(f32).tiny))
            Ynorm = (Yn[0] * inv_n, Yn[1] * inv_n)
            if orth == "ns":
                # subspace iteration: revival + pair polar per step; the
                # refs leave as the complex-orthonormal Q, no XLA QR
                Y = _ns_orth_pair_value((Ynorm[0] + eps * Y[0],
                                         Ynorm[1] + eps * Y[1]))
            elif orth == "tri":
                Y = _tri_newton_pair(Ynorm)
            else:
                Y = Ynorm
            y_r[:] = Y[0]
            y_i[:] = Y[1]


#: Damped triangular-Newton iterations for ``orth="tri"``.  The damped
#: schedule (s = 1/max(1, ||E||_F)) contracts linearly until ||E|| < 1,
#: then quadratically; 8 iterations reach QR to f32 precision even from a
#: random cold start (measured k=64: E 3.6 -> 5e-10 in 8; tracked-regime
#: starts converge in 4).
_TRI_NEWTON_ITERS = 8


def _tri_newton_pair(X, iters: int = _TRI_NEWTON_ITERS):
    """QR-GAUGE orthogonalization of a pair X [n, k] by damped triangular
    Newton: iterate X <- X (I - s (triu(E, 1) + diag(E)/2)), E = X^H X - I,
    s = 1/max(1, ||E||_F).

    Each correction is upper-triangular, so the limit satisfies
    X_inf = X_0 R^{-1} with R upper triangular with positive real diagonal
    — i.e. EXACTLY the thin-QR Q factor of X_0, in matmuls + iota masks
    only.  This is the fused tracked-ritz kernel's refresh
    orthogonalization: the r5 f64 oracle showed the NS polar (symmetric
    gauge, mixes columns) costs real accuracy under the jacobi tracker
    (all-NS cells 0.67-0.70 vs the qr-gauge jacobi cells 0.77-0.81,
    scripts/jacobi_oracle.py) — QR's nested column spans are what keep
    the cached basis eigen-ordered, and this iteration reproduces that
    gauge without a Householder factorization."""
    f32 = jnp.float32
    k = X[0].shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    eye = (row == col).astype(f32)
    up = (col > row).astype(f32)
    half = up + 0.5 * eye
    def _step(_, X):
        G = _cdot_ct(X, X)                     # X^H X (hermitian pair)
        Er = G[0] - eye
        Ei = G[1]
        nf2 = jnp.sum(Er * Er + Ei * Ei)
        s = jax.lax.rsqrt(jnp.maximum(nf2, 1.0))
        # T = I - s*(triu(E,1) + diag(E)/2); diag(E) is real (hermitian),
        # so T's imaginary part has no diagonal
        Tr = eye - s * (half * Er)
        Ti = -s * (up * Ei)
        return _cdot(X, (Tr, Ti))

    # fori_loop, not a Python unroll — Mosaic compile cost scales with
    # unrolled body count (see _jacobi_rounds_pair), and this runs inside
    # every K12cr kernel
    return jax.lax.fori_loop(0, iters, _step, X)


def _k1c_kernel(eta_ref, y1h_ref, w_ref, *refs,
                C: int, chi: int, d: int, forward: bool, emit_y: bool,
                q: int = 1, orth: str = "qr"):
    eta = eta_ref[0, 0]
    y1h = y1h_ref[:]                  # [N, C] real
    w = w_ref[:]                      # [N, 1] real
    # pair operands: left, right, le, re, phil, phir, V0 (7 pairs = 14 refs)
    (left, right, le, re, phil, phir, V0) = _pairs(refs[:14])
    bt_r, bt_i, y_r, y_i = refs[14:]
    left_at, right_at = _val_accessors(left, right, chi, d, forward)
    BT, G = _k1c_bt_grad(left_at, right_at, le, re, phil, phir, y1h, w,
                         C=C, chi=chi, d=d, forward=forward)
    _k1c_tsgo_power(eta, BT, G, V0, bt_r, bt_i, y_r, y_i,
                    C=C, chi=chi, d=d, forward=forward, emit_y=emit_y, q=q,
                    orth=orth)


def _k1c_call(eta, y1h, w, left, right, le, re, phil, phir, V0, *,
              C, chi, d, forward, emit_y, q, orth, est):
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
    )
    kern = functools.partial(_k1c_kernel, C=C, chi=chi, d=d, forward=forward,
                             emit_y=emit_y, q=q, orth=orth)
    flat = []
    for p in (left, right, le, re, phil, phir, V0):
        flat.extend(p)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * (2 + 14),
        out_specs=tuple(pb._vmem() for _ in range(4)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(eta, y1h, w, *flat)


def _k1c_tail_kernel(v0_r, v0_i, bt_r, bt_i, y_r, y_i, *, C: int, chi: int,
                     d: int, forward: bool, q: int, orth: str = "qr"):
    """Standalone complex warm power step (pair twin of
    pallas_bond._k1_tail_kernel): past SPLIT_TAIL_FOOTPRINT the in-kernel
    tail crashes the Mosaic compiler, so bond_step_c runs K1 with
    emit_y=False and this kernel reads the bond-tensor pair back
    block-by-block."""
    BT = [[(bt_r[c, :, k, :], bt_i[c, :, k, :]) for k in range(d)]
          for c in range(C)]
    _k1c_power(BT, (v0_r[:], v0_i[:]), y_r, y_i, C=C, chi=chi, d=d,
               forward=forward, emit_y=True, q=q, orth=orth)


def _k1c_tail_call(BTp, V0, *, C, chi, d, forward, q, orth="qr", est=None):
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((chi * d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
    )
    kern = functools.partial(_k1c_tail_kernel, C=C, chi=chi, d=d,
                             forward=forward, q=q, orth=orth)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._vmem()] * 4,
        out_specs=(pb._vmem(), pb._vmem()),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(V0[0], V0[1], BTp[0], BTp[1])


# --------------------------------------------------------------------------
# K1 split for data-parallel meshes (pair twin of pallas_bond._k1_grad_* /
# _k1_update_*): the LOCAL shard's complex gradient is computed per shard,
# the caller psums both components over the mesh axis — one collective of
# the (re, im) gradient pair per bond update — and the TSGO step + power
# step run redundantly on every device against replicated operands.
# --------------------------------------------------------------------------

def _k1c_grad_kernel(y1h_ref, w_ref, *refs, C: int, chi: int, d: int,
                     forward: bool):
    y1h = y1h_ref[:]
    w = w_ref[:]
    # pairs: left, right, le, re, phil, phir (6 pairs = 12 refs)
    (left, right, le, re, phil, phir) = _pairs(refs[:12])
    g_r, g_i = refs[12:]
    left_at, right_at = _val_accessors(left, right, chi, d, forward)
    _, G = _k1c_bt_grad(left_at, right_at, le, re, phil, phir, y1h, w,
                        C=C, chi=chi, d=d, forward=forward)
    for c in range(C):
        for k in range(d):
            g_r[c, :, k, :] = G[c][k][0]
            g_i[c, :, k, :] = G[c][k][1]


def _k1c_update_kernel(eta_ref, *refs, C: int, chi: int, d: int,
                       forward: bool, emit_y: bool, q: int = 1,
                       orth: str = "qr"):
    eta = eta_ref[0, 0]
    # pairs: left, right, G, V0 (4 pairs = 8 refs)
    (left, right, Gp, V0) = _pairs(refs[:8])
    bt_r, bt_i, y_r, y_i = refs[8:]

    if not forward:
        A2 = (left[0].reshape(chi * d, chi), left[1].reshape(chi * d, chi))
    BT = [[None] * d for _ in range(C)]
    G = [[None] * d for _ in range(C)]
    for c in range(C):
        if forward:
            Cc2 = (left[0][c].reshape(chi * d, chi),
                   left[1][c].reshape(chi * d, chi))
        for k in range(d):
            if forward:
                BT[c][k] = _cdot(Cc2, (right[0][:, k, :], right[1][:, k, :]))
            else:
                BT[c][k] = _cdot(A2, (right[0][c, :, k, :],
                                      right[1][c, :, k, :]))
            G[c][k] = (Gp[0][c, :, k, :], Gp[1][c, :, k, :])
    _k1c_tsgo_power(eta, BT, G, V0, bt_r, bt_i, y_r, y_i,
                    C=C, chi=chi, d=d, forward=forward, emit_y=emit_y, q=q,
                    orth=orth)


def _k1c_grad_call(y1h, w, left, right, le, re, phil, phir, *,
                   C, chi, d, forward, est):
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
    )
    kern = functools.partial(_k1c_grad_kernel, C=C, chi=chi, d=d,
                             forward=forward)
    flat = []
    for p in (left, right, le, re, phil, phir):
        flat.extend(p)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._vmem()] * (2 + 12),
        out_specs=(pb._vmem(), pb._vmem()),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(y1h, w, *flat)


def _k1c_update_call(eta, left, right, G, V0, *, C, chi, d, forward,
                     emit_y, q, orth, est):
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
        jax.ShapeDtypeStruct((chi * d, chi), f32),
    )
    kern = functools.partial(_k1c_update_kernel, C=C, chi=chi, d=d,
                             forward=forward, emit_y=emit_y, q=q, orth=orth)
    flat = []
    for p in (left, right, G, V0):
        flat.extend(p)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * 8,
        out_specs=tuple(pb._vmem() for _ in range(4)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(eta, *flat)


# --------------------------------------------------------------------------
# K2: projection + cutoff + split factors + env step (complex)
# --------------------------------------------------------------------------

def _k2c_project_mask(cutoff, max_rank, bt_ck, Q, *, C: int, chi: int,
                      d: int, forward: bool):
    """Shared complex K2 math (pair twin of pallas_bond._k2_project_mask):
    project the bond-tensor pair onto Q, direction energies (|.|^2 over both
    components), and the ITensor cutoff masks.  ``bt_ck(c, k)`` yields the
    (re, im) bond-tensor block [chi*d, chi].  Returns
    (B, mask_row, mask_col, Qm) with B/Qm pair-typed."""
    f32 = jnp.float32

    def q_k(k):
        return (Q[0][k * chi:(k + 1) * chi, :], Q[1][k * chi:(k + 1) * chi, :])

    # ---- project + energies -----------------------------------------------
    if not forward:
        B = [None] * C                                 # US_c [chi*d, keep]
        wv = jnp.zeros((1, chi), f32)
        for c in range(C):
            acc = None
            for k in range(d):
                term = _cdot(bt_ck(c, k), q_k(k))
                acc = term if acc is None else _cadd(acc, term)
            B[c] = acc
            wv = wv + jnp.sum(_abs2(acc), axis=0, keepdims=True)
    else:
        B = [[None] * d for _ in range(C)]             # SVh_ck [keep, chi]
        wv_c = jnp.zeros((chi, 1), f32)
        for c in range(C):
            for k in range(d):
                B_ck = _cdot_ct(Q, bt_ck(c, k))        # Q^H BT
                B[c][k] = B_ck
                wv_c = wv_c + _dot(_abs2(B_ck), jnp.ones((chi, 1), f32))
        eye0 = (jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)
                ).astype(f32)
        wv = _dot(jnp.ones((1, chi), f32), eye0 * wv_c)

    # ---- cutoff mask (identical real machinery) ---------------------------
    mask_row, mask_col = pb._pairwise_cutoff_mask(wv, cutoff, max_rank, chi)
    Qm = (Q[0] * mask_row, Q[1] * mask_row)
    return B, mask_row, mask_col, Qm


def _k2c_emit(B, mask_row, mask_col, Qm, center_r, center_i, core_r, core_i,
              *, C: int, chi: int, d: int, forward: bool):
    """Write the complex split factors in their final core layouts."""
    if not forward:
        for c in range(C):
            center_r[c] = (B[c][0] * mask_row).reshape(chi, d, chi)
            center_i[c] = (B[c][1] * mask_row).reshape(chi, d, chi)
        for k in range(d):
            qmk = (Qm[0][k * chi:(k + 1) * chi, :],
                   Qm[1][k * chi:(k + 1) * chi, :])
            core_r[:, k, :] = qmk[0].T          # V = Q^H (conj lands on imag)
            core_i[:, k, :] = -qmk[1].T
    else:
        for c in range(C):
            for k in range(d):
                center_r[c, :, k, :] = B[c][k][0] * mask_col
                center_i[c, :, k, :] = B[c][k][1] * mask_col
        core_r[:] = Qm[0].reshape(chi, d, chi)  # U = Q (no conj)
        core_i[:] = Qm[1].reshape(chi, d, chi)


def _k2c_env_vals(Qm, env, phi, envls, *, chi: int, d: int, forward: bool):
    """Advance the (local) pair environment through the masked isometry,
    with per-sample renormalization and log-scale accumulation.  Value-
    level core shared by the single-bond kernels (ref-wrapping below) and
    the multi-bond block kernel (env carried as live values)."""
    f32 = jnp.float32
    N = env[0].shape[0]
    if not forward:
        v2 = (jnp.zeros((N, chi), f32), jnp.zeros((N, chi), f32))
        for k in range(d):
            tmp_k = _cmul((phi[0][:, k:k + 1], phi[1][:, k:k + 1]), env)
            qmk = (Qm[0][k * chi:(k + 1) * chi, :],
                   Qm[1][k * chi:(k + 1) * chi, :])
            v2 = _cadd(v2, _cdot(tmp_k, _cconj(qmk)))
    else:
        tmp = _ckron_batch(env, phi)
        v2 = _cdot(tmp, Qm)
    nrm2 = jnp.sum(_abs2(v2), axis=1, keepdims=True)
    nrm = jnp.sqrt(nrm2)
    safe = jnp.maximum(nrm, jnp.finfo(f32).tiny)
    inv = jnp.where(nrm > 0, 1.0 / safe, 1.0)
    return ((v2[0] * inv, v2[1] * inv),
            envls + jnp.where(nrm > 0, jnp.log(safe), 0.0))


def _k2c_env_advance(Qm, env, phi, envls_ref, env2_r, env2_i, envls2, *,
                     chi: int, d: int, forward: bool):
    env2, ls2 = _k2c_env_vals(Qm, env, phi, envls_ref[:],
                              chi=chi, d=d, forward=forward)
    env2_r[:] = env2[0]
    env2_i[:] = env2[1]
    envls2[:] = ls2


def _k2c_kernel(cutoff_ref, *refs, C: int, chi: int, d: int, forward: bool):
    # pairs: bt, q, env, phi (4 pairs = 8 refs) + envls (real)
    (bt, Q, env, phi) = _pairs(refs[:8])
    envls_ref = refs[8]
    (center_r, center_i, core_r, core_i, env2_r, env2_i, envls2) = refs[9:]
    B, mask_row, mask_col, Qm = _k2c_project_mask(
        cutoff_ref[0, 0], cutoff_ref[0, 1],
        lambda c, k: (bt[0][c, :, k, :], bt[1][c, :, k, :]), Q,
        C=C, chi=chi, d=d, forward=forward)
    _k2c_emit(B, mask_row, mask_col, Qm, center_r, center_i, core_r, core_i,
              C=C, chi=chi, d=d, forward=forward)
    _k2c_env_advance(Qm, env, phi, envls_ref, env2_r, env2_i, envls2,
                     chi=chi, d=d, forward=forward)


def _k2c_split_kernel(cutoff_ref, *refs, C: int, chi: int, d: int,
                      forward: bool):
    """Replicated half of K2 for the dp path: split factors + the masked
    isometry pair (consumed by _k2c_env_kernel on each shard)."""
    (bt, Q) = _pairs(refs[:4])
    (center_r, center_i, core_r, core_i, qm_r, qm_i) = refs[4:]
    B, mask_row, mask_col, Qm = _k2c_project_mask(
        cutoff_ref[0, 0], cutoff_ref[0, 1],
        lambda c, k: (bt[0][c, :, k, :], bt[1][c, :, k, :]), Q,
        C=C, chi=chi, d=d, forward=forward)
    _k2c_emit(B, mask_row, mask_col, Qm, center_r, center_i, core_r, core_i,
              C=C, chi=chi, d=d, forward=forward)
    qm_r[:] = Qm[0]
    qm_i[:] = Qm[1]


def _k2c_env_kernel(*refs, chi: int, d: int, forward: bool):
    """Local half of K2 for the dp path: advance this shard's pair
    environments through the replicated masked isometry."""
    (Qm, env, phi) = _pairs(refs[:6])
    envls_ref, env2_r, env2_i, envls2 = refs[6:]
    _k2c_env_advance(Qm, env, phi, envls_ref, env2_r, env2_i, envls2,
                     chi=chi, d=d, forward=forward)


def _k2c_split_call(cutoff, BT, Q, *, C, chi, d, forward, est):
    f32 = jnp.float32
    nq = Q[0].shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),
        jax.ShapeDtypeStruct((chi, d, chi), f32),
        jax.ShapeDtypeStruct((chi, d, chi), f32),
        jax.ShapeDtypeStruct((nq, chi), f32),
        jax.ShapeDtypeStruct((nq, chi), f32),
    )
    kern = functools.partial(_k2c_split_kernel, C=C, chi=chi, d=d,
                             forward=forward)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * 4,
        out_specs=tuple(pb._vmem() for _ in range(6)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(cutoff, *BT, *Q)


def _k2c_env_call(Qm, env, env_ls, phi, *, chi, d, forward, est):
    f32 = jnp.float32
    N = env[0].shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((N, chi), f32),
        jax.ShapeDtypeStruct((N, chi), f32),
        jax.ShapeDtypeStruct((N, 1), f32),
    )
    kern = functools.partial(_k2c_env_kernel, chi=chi, d=d, forward=forward)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._vmem()] * 7,
        out_specs=tuple(pb._vmem() for _ in range(3)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(*Qm, *env, *phi, env_ls)


def _k2c_call(cutoff, BT, Q, env, env_ls, phi, *, C, chi, d, forward, est):
    f32 = jnp.float32
    N = env[0].shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),
        jax.ShapeDtypeStruct((chi, d, chi), f32),
        jax.ShapeDtypeStruct((chi, d, chi), f32),
        jax.ShapeDtypeStruct((N, chi), f32),
        jax.ShapeDtypeStruct((N, chi), f32),
        jax.ShapeDtypeStruct((N, 1), f32),
    )
    kern = functools.partial(_k2c_kernel, C=C, chi=chi, d=d, forward=forward)
    flat = []
    for p in (BT, Q, env, phi):
        flat.extend(p)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * 9,
        out_specs=tuple(pb._vmem() for _ in range(7)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(cutoff, *flat, env_ls)


# --------------------------------------------------------------------------
# K12c: the whole complex bond step as ONE kernel (pair twin of
# pallas_bond._k12_kernel — valid whenever no orthogonalization has to run
# outside the kernel: orth="ns" refresh bonds and frozen bonds).  The bond
# tensor pair stays a live VMEM value, never touching HBM.
# --------------------------------------------------------------------------

def _k12c_kernel(scal_ref, y1h_ref, w_ref, *refs, C: int, chi: int, d: int,
                 forward: bool, emit_y: bool, q: int, orth: str):
    eta = scal_ref[0, 0]
    y1h = y1h_ref[:]
    w = w_ref[:]
    # pairs: left, right, le, re, phil, phir, V0 (7 pairs = 14 refs)
    (left, right, le, re, phil, phir, V0) = _pairs(refs[:14])
    envls_ref = refs[14]
    (center_r, center_i, core_r, core_i, env2_r, env2_i, envls2,
     y_r, y_i) = refs[15:]
    left_at, right_at = _val_accessors(left, right, chi, d, forward)
    BT, G = _k1c_bt_grad(left_at, right_at, le, re, phil, phir, y1h, w,
                         C=C, chi=chi, d=d, forward=forward)
    BT = _k1c_tsgo_power(eta, BT, G, V0, None, None, y_r, y_i,
                         C=C, chi=chi, d=d, forward=forward,
                         emit_y=emit_y, q=q, orth=orth)
    B, mask_row, mask_col, Qm = _k2c_project_mask(
        scal_ref[0, 1], scal_ref[0, 2], lambda c, k: BT[c][k],
        (y_r[:], y_i[:]), C=C, chi=chi, d=d, forward=forward)
    _k2c_emit(B, mask_row, mask_col, Qm, center_r, center_i, core_r, core_i,
              C=C, chi=chi, d=d, forward=forward)
    env = le if forward else re
    phi = phil if forward else phir
    _k2c_env_advance(Qm, env, phi, envls_ref, env2_r, env2_i, envls2,
                     chi=chi, d=d, forward=forward)


def _k12c_call(scal, y1h, w, left, right, le, re, phil, phir, V0, env_ls, *,
               C, chi, d, forward, emit_y, q, orth, est=None):
    f32 = jnp.float32
    N = le[0].shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center re
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center im
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # core re
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # core im
        jax.ShapeDtypeStruct((N, chi), f32),           # env' re
        jax.ShapeDtypeStruct((N, chi), f32),           # env' im
        jax.ShapeDtypeStruct((N, 1), f32),             # env_ls'
        jax.ShapeDtypeStruct((chi * d, chi), f32),     # Q re
        jax.ShapeDtypeStruct((chi * d, chi), f32),     # Q im
    )
    kern = functools.partial(_k12c_kernel, C=C, chi=chi, d=d,
                             forward=forward, emit_y=emit_y, q=q, orth=orth)
    flat = []
    for pr in (left, right, le, re, phil, phir, V0):
        flat.extend(pr)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * (2 + 14 + 1),
        out_specs=tuple(pb._vmem() for _ in range(9)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(scal, y1h, w, *flat, env_ls)


# --------------------------------------------------------------------------
# K12cr: the tracked-RITZ complex bond step as ONE kernel.
#
# The quality route for complex chi > COMPLEX_RITZ_CHI_GATE is the warm
# split + per-bond eigen-rotation (svd_alg="randomized_warm_ritz").  Its
# exact sweeps need an eigh and stay on the XLA bond path, but the shipped
# exact->track schedule runs almost every sweep on a TRACKER — and the r5
# Jacobi tracker (ops/decomp._ritz_rot_jacobi) is pure matmuls +
# elementwise math, i.e. Mosaic-expressible.  Keeping ANY per-bond op on
# XLA costs ~30 ms/sweep at ECG shapes just in op-issue floor (190 bonds
# x ~160 us for even two small matmuls, scripts/ritz_unit_probe.py), so
# the tracked bond step only wins big if EVERYTHING fuses: K1 body ->
# NS-refreshed basis -> projected Gram S -> in-kernel Jacobi rounds ->
# rotated+masked split factors -> env advance, one pallas_call per bond.
# --------------------------------------------------------------------------

def _jacobi_rounds_pair(S, rounds: int):
    """Mosaic twin of ops/decomp._ritz_rot_jacobi on a hermitian pair
    S = (Sr, Si) [k, k]: ``rounds`` alternating odd-even adjacent-pair
    exact 2x2 rotations, each built from matmuls with constant iota masks
    (no gather/scatter, no 1-D ops).  Returns (wv [1, k] row of the final
    diagonal = Rayleigh energies in round order, W pair [k, k]).  Same
    branch rules as the XLA version, so the two routes truncate
    identically."""
    f32 = jnp.float32
    k = S[0].shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(f32)
    up_m = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) + 1
            ).astype(f32)                      # [i, i+1]
    dn_m = up_m.T                              # [i+1, i]
    ones_c = jnp.ones((k, 1), f32)
    ones_r = jnp.ones((1, k), f32)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    # normalize like the XLA route: nf = max |diag|
    nf = jnp.maximum(jnp.max(jnp.abs(S[0] * eye)), jnp.finfo(f32).tiny)
    Sr, Si = S[0] / nf, S[1] / nf
    Wr, Wi = eye, jnp.zeros((k, k), f32)

    def down(v):                               # v2[i] = v[i-1]
        return _dot(dn_m, v)

    # lax.fori_loop, NOT a Python unroll: Mosaic's compile cost for this
    # body is ~30 s PER UNROLLED COPY at k=64 (measured on v5e — 6 rounds
    # = 200 s, 24 rounds = 444 s, which is what stalled the r5 chip
    # session); as a loop the kernel compiles one body regardless of
    # round count.  ``off`` becomes a traced scalar (jnp "%" matches the
    # Python-int semantics of the unrolled original for idx_c - off = -1).
    def _round(r, carry):
        Sr, Si, Wr, Wi = carry
        off = jax.lax.rem(r, 2)
        alpha = _dot(Sr * eye, ones_c)                       # [k, 1]
        beta = _dot(up_m, alpha)                             # alpha[i+1]
        wr = _dot(Sr * up_m, ones_c)                         # S[i, i+1]
        wi = _dot(Si * up_m, ones_c)
        first = (((idx_c - off) % 2 == 0) & (idx_c >= off)
                 & (idx_c + 1 < k))
        aw2 = wr * wr + wi * wi
        half = (alpha - beta) * 0.5
        root = jnp.sqrt(half * half + aw2)
        mu_p = (alpha + beta) * 0.5 + root
        d_hi = mu_p - beta
        d_lo = mu_p - alpha
        use_hi = alpha >= beta
        xr = jnp.where(use_hi, d_hi, wr)
        xi = jnp.where(use_hi, jnp.zeros_like(wi), wi)
        yr = jnp.where(use_hi, wr, d_lo)
        yi = jnp.where(use_hi, -wi, jnp.zeros_like(wi))
        n2 = xr * xr + xi * xi + yr * yr + yi * yi
        live = first & (n2 > jnp.finfo(f32).tiny)
        inv = jax.lax.rsqrt(jnp.where(live, n2, 1.0))
        live_f = live.astype(f32)
        xr = jnp.where(live, xr * inv, 1.0)
        xi = jnp.where(live, xi * inv, 0.0)
        yr = jnp.where(live, yr * inv, 0.0)
        yi = jnp.where(live, yi * inv, 0.0)
        live_dn = down(live_f)
        # J: col i = (x, y) at rows (i, i+1); col i+1 = (-conj(y), conj(x))
        diag_r = live_f * xr + live_dn * down(xr) \
            + (1.0 - live_f - live_dn)
        diag_i = live_f * xi - live_dn * down(xi)
        Jr = (eye * _dot(diag_r, ones_r)
              + up_m * _dot(-(live_f * yr), ones_r)
              + dn_m * _dot(down(live_f * yr), ones_r))
        Ji = (eye * _dot(diag_i, ones_r)
              + up_m * _dot(live_f * yi, ones_r)
              + dn_m * _dot(down(live_f * yi), ones_r))
        SJ = _cdot((Sr, Si), (Jr, Ji))
        Sr, Si = _cdot_ct((Jr, Ji), SJ)
        Sr = (Sr + Sr.T) * 0.5                               # re-hermitize
        Si = (Si - Si.T) * 0.5
        Wr, Wi = _cdot((Wr, Wi), (Jr, Ji))
        return (Sr, Si, Wr, Wi)

    Sr, Si, Wr, Wi = jax.lax.fori_loop(0, rounds, _round,
                                       (Sr, Si, Wr, Wi))
    wv = _dot(ones_r, Sr * eye) * nf                         # [1, k]
    return wv, (Wr, Wi)


def _k12cr_kernel(scal_ref, y1h_ref, w_ref, *refs, C: int, chi: int, d: int,
                  forward: bool, emit_y: bool, q: int, rounds: int):
    """One-kernel tracked-ritz complex bond step: _k1c body (QR-gauge
    tri-Newton-refreshed basis), projected Gram S = B^H B, in-kernel
    Jacobi rotation, rotated + cutoff-masked split factors, env advance.
    The cached basis (y refs) leaves ROTATED (Q @ W, unmasked) — the
    eigen-ordering the next sweep's tracker relies on, exactly like
    ops/decomp.warm_ritz_split_*."""
    eta = scal_ref[0, 0]
    y1h = y1h_ref[:]
    w = w_ref[:]
    (left, right, le, re, phil, phir, V0) = _pairs(refs[:14])
    envls_ref = refs[14]
    (center_r, center_i, core_r, core_i, env2_r, env2_i, envls2,
     y_r, y_i) = refs[15:]
    left_at, right_at = _val_accessors(left, right, chi, d, forward)
    BT, G = _k1c_bt_grad(left_at, right_at, le, re, phil, phir, y1h, w,
                         C=C, chi=chi, d=d, forward=forward)
    # in-kernel refresh is the QR-gauge tri-Newton (oracle: the NS polar's
    # symmetric gauge degrades the tracked band); frozen bonds pass V0
    BT = _k1c_tsgo_power(eta, BT, G, V0, None, None, y_r, y_i,
                         C=C, chi=chi, d=d, forward=forward,
                         emit_y=emit_y, q=q, orth="tri")
    Q = (y_r[:], y_i[:])

    def q_k(kk):
        return (Q[0][kk * chi:(kk + 1) * chi, :],
                Q[1][kk * chi:(kk + 1) * chi, :])

    # ---- projected blocks + Gram S -----------------------------------------
    f32 = jnp.float32
    if not forward:
        B = [None] * C                                 # B_c [chi*d, k]
        S = (jnp.zeros((chi, chi), f32), jnp.zeros((chi, chi), f32))
        for c in range(C):
            acc = None
            for kk in range(d):
                term = _cdot(BT[c][kk], q_k(kk))
                acc = term if acc is None else _cadd(acc, term)
            B[c] = acc
            S = _cadd(S, _cdot_ct(acc, acc))
    else:
        B = [[None] * d for _ in range(C)]             # B_ck [k, chi]
        S = (jnp.zeros((chi, chi), f32), jnp.zeros((chi, chi), f32))
        for c in range(C):
            for kk in range(d):
                B_ck = _cdot_ct(Q, BT[c][kk])
                B[c][kk] = B_ck
                # S += B_ck @ B_ck^H
                S = _cadd(S, (_dot(B_ck[0], B_ck[0].T)
                              + _dot(B_ck[1], B_ck[1].T),
                              _dot(B_ck[1], B_ck[0].T)
                              - _dot(B_ck[0], B_ck[1].T)))

    # ---- rotation + mask ----------------------------------------------------
    wv, W = _jacobi_rounds_pair(S, rounds)
    mask_row, mask_col = pb._pairwise_cutoff_mask(
        wv, scal_ref[0, 1], scal_ref[0, 2], chi)
    Wm = (W[0] * mask_row, W[1] * mask_row)
    Qrot = _cdot(Q, W)                                 # cache (unmasked)
    Qm = _cdot(Q, Wm)                                  # masked isometry

    # ---- emit ---------------------------------------------------------------
    if not forward:
        for c in range(C):
            BW = _cdot(B[c], Wm)                       # US_c [chi*d, k]
            center_r[c] = BW[0].reshape(chi, d, chi)
            center_i[c] = BW[1].reshape(chi, d, chi)
        for kk in range(d):
            core_r[:, kk, :] = Qm[0][kk * chi:(kk + 1) * chi, :].T
            core_i[:, kk, :] = -Qm[1][kk * chi:(kk + 1) * chi, :].T
    else:
        for c in range(C):
            for kk in range(d):
                WB = _cdot_ct(Wm, B[c][kk])            # SVh_ck [k, chi]
                center_r[c, :, kk, :] = WB[0]
                center_i[c, :, kk, :] = WB[1]
        core_r[:] = Qm[0].reshape(chi, d, chi)
        core_i[:] = Qm[1].reshape(chi, d, chi)
    env = le if forward else re
    phi = phil if forward else phir
    _k2c_env_advance(Qm, env, phi, envls_ref, env2_r, env2_i, envls2,
                     chi=chi, d=d, forward=forward)
    y_r[:] = Qrot[0]
    y_i[:] = Qrot[1]


def _k12cr_call(scal, y1h, w, left, right, le, re, phil, phir, V0, env_ls, *,
                C, chi, d, forward, emit_y, q, rounds, est=None):
    f32 = jnp.float32
    N = le[0].shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center re
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),   # center im
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # core re
        jax.ShapeDtypeStruct((chi, d, chi), f32),      # core im
        jax.ShapeDtypeStruct((N, chi), f32),           # env' re
        jax.ShapeDtypeStruct((N, chi), f32),           # env' im
        jax.ShapeDtypeStruct((N, 1), f32),             # env_ls'
        jax.ShapeDtypeStruct((chi * d, chi), f32),     # Q@W re (cache)
        jax.ShapeDtypeStruct((chi * d, chi), f32),     # Q@W im
    )
    kern = functools.partial(_k12cr_kernel, C=C, chi=chi, d=d,
                             forward=forward, emit_y=emit_y, q=q,
                             rounds=rounds)
    flat = []
    for pr in (left, right, le, re, phil, phir, V0):
        flat.extend(pr)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * (2 + 14 + 1),
        out_specs=tuple(pb._vmem() for _ in range(9)),
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(scal, y1h, w, *flat, env_ls)


def bond_step_c_ritz(A_or_B, center_c, le, re, env_ls, phil, phir, y1h, w,
                     V0, eta, cutoff, *, forward: bool, refresh: bool = True,
                     power_iters: int = 1, max_rank=None, rounds=None,
                     rot: str = "jacobi"):
    """One fused ritz complex bond step (see _k12cr_kernel).  Same operand
    contract as :func:`bond_step_c`; single-device only (eigh-rotation
    sweeps and any dp mesh keep the XLA bond path).  The warm refresh
    inside the kernel is the QR-GAUGE tri-Newton (``_tri_newton_pair``) —
    gauge-identical to the XLA route's pinned qr orth, which the f64
    oracle shows is what keeps the jacobi-tracked band
    (scripts/jacobi_oracle.py; the NS polar's symmetric gauge measured
    0.67-0.70 vs qr-gauge 0.77-0.81).

    ``rot``: "jacobi" (tracked sweeps, _JACOBI_ROUNDS) or "jacobi_warm"
    (cold-start sweeps, _JACOBI_WARM_ROUNDS); ``rounds`` overrides."""
    from .decomp import _JACOBI_ROUNDS, _JACOBI_WARM_ROUNDS
    if rounds is None:
        rounds = (_JACOBI_WARM_ROUNDS if rot == "jacobi_warm"
                  else _JACOBI_ROUNDS)
    C, chi, d, _ = center_c[0].shape
    est = 2 * pb.k12_footprint(C, chi, d, le[0].shape[0])
    mr = jnp.float32(chi) if max_rank is None else max_rank.astype(jnp.float32)
    scal = jnp.stack([eta.astype(jnp.float32),
                      cutoff.astype(jnp.float32), mr])[None, :]
    if forward:
        left, right = center_c, A_or_B
    else:
        left, right = A_or_B, center_c
    (c_r, c_i, k_r, k_i, e_r, e_i, ls2, q_r, q_i) = _k12cr_call(
        scal, y1h, w[:, None], left, right, le, re, phil, phir, V0,
        env_ls[:, None], C=C, chi=chi, d=d, forward=forward,
        emit_y=refresh, q=power_iters,
        rounds=rounds, est=est)
    return ((c_r, c_i), (k_r, k_i), (e_r, e_i), ls2[:, 0], (q_r, q_i))


# --------------------------------------------------------------------------
# K12mc: a BLOCK of consecutive complex bond steps as ONE kernel (pair twin
# of pallas_bond._k12m_kernel): the center pair carries through VMEM
# scratch refs, the environment pair and log-scales carry as live values,
# and the forward merged-center class slices are rebuilt per component via
# pallas_bond._merge_center_rows (exact one-hot scatter matmuls).
# --------------------------------------------------------------------------

def _k12mc_kernel(scal_ref, y1h_ref, w_ref, *refs, Bb: int, C: int,
                  chi: int, d: int, forward: bool, emit_y: bool, q: int,
                  orth: str):
    eta = scal_ref[0, 0]
    cutoff = scal_ref[0, 1]
    mr = scal_ref[0, 2]
    y1h = y1h_ref[:]
    w = w_ref[:]
    # blocked pair refs: lhs, envx, phil, phir, v0 (5 pairs), then
    # center0 pair, env0 pair, envls0
    (lhs_r, lhs_i, envx_r, envx_i, phil_r, phil_i, phir_r, phir_i,
     v0_r, v0_i, c0_r, c0_i, env0_r, env0_i, envls0_ref) = refs[:15]
    (co_r, co_i, v_blk_r, v_blk_i, env_blk_r, env_blk_i, envls_blk,
     qv_blk_r, qv_blk_i) = refs[15:24]
    cs_r, cs_i, y_r, y_i = refs[24:]
    env = (env0_r[:], env0_i[:])
    envls = envls0_ref[:]
    for b in range(Bb):
        phil = (phil_r[b], phil_i[b])
        phir = (phir_r[b], phir_i[b])
        if forward:
            le, re = env, (envx_r[b], envx_i[b])
            right_at = lambda k, _b=b: (lhs_r[_b, k], lhs_i[_b, k])   # noqa: E731
            if b == 0:
                left_at = lambda c: (c0_r[c], c0_i[c])                # noqa: E731
            else:
                left_at = lambda c: (                                 # noqa: E731
                    pb._merge_center_rows(cs_r, c, chi, d),
                    pb._merge_center_rows(cs_i, c, chi, d))
        else:
            le, re = (envx_r[b], envx_i[b]), env
            left_at = lambda _b=b: (lhs_r[_b], lhs_i[_b])             # noqa: E731
            if b == 0:
                right_at = lambda c, k: (c0_r[c, :, k, :],            # noqa: E731
                                         c0_i[c, :, k, :])
            else:
                right_at = lambda c, k: (cs_r[c, :, k, :],            # noqa: E731
                                         cs_i[c, :, k, :])
        BT, G = _k1c_bt_grad(left_at, right_at, le, re, phil, phir, y1h,
                             w, C=C, chi=chi, d=d, forward=forward)
        BT = _k1c_tsgo_power(eta, BT, G, (v0_r[b], v0_i[b]), None, None,
                             y_r, y_i, C=C, chi=chi, d=d, forward=forward,
                             emit_y=emit_y, q=q, orth=orth)
        Q = (y_r[:], y_i[:])
        Bv, mask_row, mask_col, Qm = _k2c_project_mask(
            cutoff, mr, lambda c, k: BT[c][k], Q, C=C, chi=chi, d=d,
            forward=forward)
        if not forward:
            for c in range(C):
                cs_r[c] = (Bv[c][0] * mask_row).reshape(chi, d, chi)
                cs_i[c] = (Bv[c][1] * mask_row).reshape(chi, d, chi)
            for k in range(d):
                v_blk_r[b, :, k, :] = Qm[0][k * chi:(k + 1) * chi, :].T
                v_blk_i[b, :, k, :] = -Qm[1][k * chi:(k + 1) * chi, :].T
        else:
            for c in range(C):
                for k in range(d):
                    cs_r[c, :, k, :] = Bv[c][k][0] * mask_col
                    cs_i[c, :, k, :] = Bv[c][k][1] * mask_col
            v_blk_r[b] = Qm[0].reshape(chi, d, chi)
            v_blk_i[b] = Qm[1].reshape(chi, d, chi)
        qv_blk_r[b] = y_r[:]
        qv_blk_i[b] = y_i[:]
        env, envls = _k2c_env_vals(Qm, env, phil if forward else phir,
                                   envls, chi=chi, d=d, forward=forward)
        env_blk_r[b] = env[0]
        env_blk_i[b] = env[1]
        envls_blk[b] = envls
    for c in range(C):
        co_r[c] = cs_r[c]
        co_i[c] = cs_i[c]


def _k12mc_call(scal, y1h, w, lhs, envx_blk, phil_blk, phir_blk, v0_blk,
                center0, env0, envls0, *, Bb, C, chi, d, forward, emit_y,
                q, orth, est=None):
    f32 = jnp.float32
    N = env0[0].shape[0]
    from jax.experimental.pallas import tpu as pltpu
    out_shape = (
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),    # center re
        jax.ShapeDtypeStruct((C, chi, d, chi), f32),    # center im
        jax.ShapeDtypeStruct((Bb, chi, d, chi), f32),   # cores re
        jax.ShapeDtypeStruct((Bb, chi, d, chi), f32),   # cores im
        jax.ShapeDtypeStruct((Bb, N, chi), f32),        # envs re
        jax.ShapeDtypeStruct((Bb, N, chi), f32),        # envs im
        jax.ShapeDtypeStruct((Bb, N, 1), f32),          # env log-scales
        jax.ShapeDtypeStruct((Bb, chi * d, chi), f32),  # subspaces re
        jax.ShapeDtypeStruct((Bb, chi * d, chi), f32),  # subspaces im
    )
    kern = functools.partial(_k12mc_kernel, Bb=Bb, C=C, chi=chi, d=d,
                             forward=forward, emit_y=emit_y, q=q, orth=orth)
    flat = []
    for pr in (lhs, envx_blk, phil_blk, phir_blk, v0_blk, center0, env0):
        flat.extend(pr)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pb._smem_scalar()] + [pb._vmem()] * (2 + 14 + 1),
        out_specs=tuple(pb._vmem() for _ in range(9)),
        scratch_shapes=[pltpu.VMEM((C, chi, d, chi), f32),
                        pltpu.VMEM((C, chi, d, chi), f32),
                        pltpu.VMEM((chi * d, chi), f32),
                        pltpu.VMEM((chi * d, chi), f32)],
        interpret=pb._INTERPRET,
        **pb._compiler_kw(est),
    )(scal, y1h, w, *flat, envls0)


def bond_block_steps_c(A_blk, center_c, envx_blk, env0, env_ls0, phil_blk,
                       phir_blk, y1h, w, V0_blk, eta, cutoff, *,
                       forward: bool, refresh: bool = True,
                       power_iters: int = 1, orth: str = "ns",
                       max_rank=None):
    """Bb consecutive complex bond updates as ONE kernel — pair twin of
    pallas_bond.bond_block_steps (same operand conventions, pair-typed)."""
    Bb, chi, d, _ = A_blk[0].shape
    C = center_c[0].shape[0]
    est = 2 * pb.block_footprint(C, chi, d, env0[0].shape[0], Bb)
    mr = (jnp.float32(chi) if max_rank is None
          else max_rank.astype(jnp.float32))
    scal = jnp.stack([eta.astype(jnp.float32),
                      cutoff.astype(jnp.float32), mr])[None, :]
    if forward:
        lhs = tuple(a.transpose(0, 2, 1, 3) for a in A_blk)
        center0 = tuple(c.reshape(C, chi * d, chi) for c in center_c)
    else:
        lhs = tuple(a.reshape(Bb, chi * d, chi) for a in A_blk)
        center0 = center_c
    (co_r, co_i, v_r, v_i, e_r, e_i, ls_blk, q_r, q_i) = _k12mc_call(
        scal, y1h, w[:, None], lhs, envx_blk, phil_blk, phir_blk, V0_blk,
        center0, env0, env_ls0[:, None], Bb=Bb, C=C, chi=chi, d=d,
        forward=forward, emit_y=refresh, q=power_iters, orth=orth, est=est)
    return ((co_r, co_i), (v_r, v_i), (e_r, e_i), ls_blk[:, :, 0],
            (q_r, q_i))


# --------------------------------------------------------------------------
# public complex bond step (pair-typed operands)
# --------------------------------------------------------------------------

def _qr_orth_pair(Y: Tuple[jnp.ndarray, jnp.ndarray]
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ops/decomp._qr_orth on a (re, im) pair, without complex dtypes."""
    Yr, Yi = Y
    R, k = Yr.shape
    top = jnp.stack([Yr, -Yi], axis=2).reshape(R, 2 * k)
    bot = jnp.stack([Yi, Yr], axis=2).reshape(R, 2 * k)
    Qr, _ = jnp.linalg.qr(jnp.concatenate([top, bot], axis=0))
    Qe = Qr[:, ::2]
    return Qe[:R], Qe[R:]


def _bond_step_c_streamed(A_or_B, center_c, le, re, env_ls, phil, phir,
                          y1h, w, V0, eta, cutoff, *, forward: bool,
                          refresh: bool, power_iters: int, orth: str,
                          max_rank, stream_tile: int):
    """Pair twin of pallas_bond._bond_step_streamed: batch tiles through
    the dp-split complex kernels (per-tile local gradient pairs summed by
    a lax.scan, one update + split, per-tile env advances)."""
    C, chi, d, _ = center_c[0].shape
    N = le[0].shape[0]
    Nt = stream_tile
    nt = -(-N // Nt)
    est = 2 * pb.kernel_footprint(C, chi, d, Nt)
    eta2 = jnp.reshape(eta.astype(jnp.float32), (1, 1))
    mr = jnp.float32(chi) if max_rank is None else max_rank.astype(jnp.float32)
    cut2 = jnp.stack([cutoff.astype(jnp.float32), mr])[None, :]

    if forward:
        left, right = center_c, A_or_B
    else:
        left, right = A_or_B, center_c

    def tiles(x):
        return pb._pad_rows(x, nt * Nt).reshape((nt, Nt) + x.shape[1:])

    def tiles_p(p):
        return (tiles(p[0]), tiles(p[1]))

    le_t, re_t = tiles_p(le), tiles_p(re)
    phil_t, phir_t = tiles_p(phil), tiles_p(phir)
    y1h_t = tiles(y1h)
    w_t = tiles(jnp.concatenate([w, jnp.zeros((nt * Nt - N,), w.dtype)])
                if nt * Nt > N else w)
    ls_t = tiles(env_ls[:, None])

    def grad_acc(G, tile):
        le_i, re_i, pl_i, pr_i, y_i, w_i = tile
        Gr, Gi = _k1c_grad_call(y_i, w_i[:, None], left, right, le_i, re_i,
                                pl_i, pr_i, C=C, chi=chi, d=d,
                                forward=forward, est=est)
        return (G[0] + Gr, G[1] + Gi), None

    G0 = (jnp.zeros((C, chi * d, d, chi), jnp.float32),
          jnp.zeros((C, chi * d, d, chi), jnp.float32))
    G, _ = jax.lax.scan(grad_acc, G0,
                        (le_t, re_t, phil_t, phir_t, y1h_t, w_t))

    split_tail = refresh and est > pb.SPLIT_TAIL_FOOTPRINT
    emit = refresh and not split_tail
    BT_r, BT_i, Y_r, Y_i = _k1c_update_call(
        eta2, left, right, G, V0, C=C, chi=chi, d=d, forward=forward,
        emit_y=emit, q=power_iters, orth=orth, est=est)
    if split_tail:
        Yp = V0
        for _ in range(power_iters):
            Yp = _k1c_tail_call((BT_r, BT_i), Yp, C=C, chi=chi, d=d,
                                forward=forward, q=1, orth=orth, est=est)
        Y_r, Y_i = Yp
    if refresh:
        Q = (Y_r, Y_i) if orth == "ns" else _qr_orth_pair((Y_r, Y_i))
    else:
        Q = V0
    (c_r, c_i, k_r, k_i, qm_r, qm_i) = _k2c_split_call(
        cut2, (BT_r, BT_i), Q, C=C, chi=chi, d=d, forward=forward, est=est)
    env_t = le_t if forward else re_t
    phi_t = phil_t if forward else phir_t

    def env_tile(_, tile):
        er_i, ei_i, ls_i, pr_i, pi_i = tile
        return None, _k2c_env_call((qm_r, qm_i), (er_i, ei_i), ls_i,
                                   (pr_i, pi_i), chi=chi, d=d,
                                   forward=forward, est=est)

    _, (e_r_t, e_i_t, ls2_t) = jax.lax.scan(
        env_tile, None, (env_t[0], env_t[1], ls_t, phi_t[0], phi_t[1]))
    e_r = e_r_t.reshape(nt * Nt, chi)[:N]
    e_i = e_i_t.reshape(nt * Nt, chi)[:N]
    ls2 = ls2_t.reshape(nt * Nt)[:N]
    return ((c_r, c_i), (k_r, k_i), (e_r, e_i), ls2, Q)


def bond_step_c(A_or_B, center_c, le, re, env_ls, phil, phir, y1h, w, V0,
                eta, cutoff, *, forward: bool, refresh: bool = True,
                axis_name: str = None, power_iters: int = 1,
                orth: str = "qr", max_rank=None,
                stream_tile: Optional[int] = None):
    """One fused complex bond step.  Every complex operand is a (re, im)
    pair of f32 arrays with the shapes of the real kernel's operands;
    returns pair-typed (center_c', core', env') plus real env_ls' and the
    pair Q'.  Semantics mirror pallas_bond.bond_step (see module
    docstring for the conjugation map).

    ``axis_name``: run the data-parallel variant inside shard_map over a dp
    mesh — batch operands are this shard's blocks; the LOCAL complex
    gradient pair is psummed over the axis (one collective of the (re, im)
    gradient per bond update), and the update + split run redundantly on
    every device while each shard's environments advance locally (the same
    contract as pallas_bond.bond_step's dp split).

    ``stream_tile``: process the batch axis in tiles of this many rows
    (:func:`_bond_step_c_streamed` — the complex N-streaming route)."""
    if stream_tile is not None:
        assert axis_name is None, "stream_tile is a single-device route"
        return _bond_step_c_streamed(
            A_or_B, center_c, le, re, env_ls, phil, phir, y1h, w, V0,
            eta, cutoff, forward=forward, refresh=refresh,
            power_iters=power_iters, orth=orth, max_rank=max_rank,
            stream_tile=stream_tile)
    C, chi, d, _ = center_c[0].shape
    est = 2 * pb.kernel_footprint(C, chi, d, le[0].shape[0])
    eta2 = jnp.reshape(eta.astype(jnp.float32), (1, 1))
    mr = jnp.float32(chi) if max_rank is None else max_rank.astype(jnp.float32)
    cut2 = jnp.stack([cutoff.astype(jnp.float32), mr])[None, :]
    w2 = w[:, None]

    if forward:
        left, right = center_c, A_or_B
    else:
        left, right = A_or_B, center_c

    # Single-kernel route (pair twin of pallas_bond's K12 path; the gate
    # uses the merged K1+K2 working set, doubled for the pair layout)
    est_k12 = 2 * pb.k12_footprint(C, chi, d, le[0].shape[0])
    if (axis_name is None
            and est_k12 <= pb.SPLIT_TAIL_FOOTPRINT
            and (not refresh or orth == "ns")):
        scal = jnp.stack([eta.astype(jnp.float32),
                          cutoff.astype(jnp.float32), mr])[None, :]
        # budget escalation keyed on the merged pair working set (the
        # gate's own measure), not the two-kernel estimate
        (c_r, c_i, k_r, k_i, e_r, e_i, ls2, q_r, q_i) = _k12c_call(
            scal, y1h, w2, left, right, le, re, phil, phir, V0,
            env_ls[:, None], C=C, chi=chi, d=d, forward=forward,
            emit_y=refresh, q=power_iters, orth=orth, est=est_k12)
        return ((c_r, c_i), (k_r, k_i), (e_r, e_i), ls2[:, 0], (q_r, q_i))

    # Large-chi route (mirrors pallas_bond.bond_step): past
    # SPLIT_TAIL_FOOTPRINT the in-kernel power tail crashes the Mosaic
    # compiler, so K1 runs emit_y=False and the tail is its own kernel.
    split_tail = refresh and est > pb.SPLIT_TAIL_FOOTPRINT
    emit = refresh and not split_tail
    if axis_name is None:
        BT_r, BT_i, Y_r, Y_i = _k1c_call(
            eta2, y1h, w2, left, right, le, re, phil, phir, V0,
            C=C, chi=chi, d=d, forward=forward, emit_y=emit,
            q=power_iters, orth=orth, est=est)
    else:
        G = _k1c_grad_call(y1h, w2, left, right, le, re, phil, phir,
                           C=C, chi=chi, d=d, forward=forward, est=est)
        G = jax.lax.psum(G, axis_name)
        BT_r, BT_i, Y_r, Y_i = _k1c_update_call(
            eta2, left, right, G, V0, C=C, chi=chi, d=d, forward=forward,
            emit_y=emit, q=power_iters, orth=orth, est=est)
    if split_tail:
        # One tail kernel per power step (q=1 each, chained — identical to
        # q steps in-kernel thanks to the per-step normalization): the
        # q=3-unrolled pair tail alone SIGKILLs the remote compile helper
        # at chi=192 (scripts/k1c_bisect.py), a q=1 tail compiles.
        # With orth="ns" each chained tail kernel carries its own
        # per-step revival + pair NS (subspace iteration).
        Yp = V0
        for _ in range(power_iters):
            Yp = _k1c_tail_call((BT_r, BT_i), Yp, C=C, chi=chi, d=d,
                                forward=forward, q=1, orth=orth, est=est)
        Y_r, Y_i = Yp
    if refresh:
        if orth == "ns":
            Q = (Y_r, Y_i)   # orthonormalized in-kernel (_k1c_power)
        else:
            Q = _qr_orth_pair((Y_r, Y_i))
    else:
        Q = V0
    env = le if forward else re
    phi = phil if forward else phir
    if axis_name is None:
        (c_r, c_i, k_r, k_i, e_r, e_i, ls2) = _k2c_call(
            cut2, (BT_r, BT_i), Q, env, env_ls[:, None], phi,
            C=C, chi=chi, d=d, forward=forward, est=est)
    else:
        (c_r, c_i, k_r, k_i, qm_r, qm_i) = _k2c_split_call(
            cut2, (BT_r, BT_i), Q, C=C, chi=chi, d=d, forward=forward,
            est=est)
        (e_r, e_i, ls2) = _k2c_env_call(
            (qm_r, qm_i), env, env_ls[:, None], phi,
            chi=chi, d=d, forward=forward, est=est)
    return ((c_r, c_i), (k_r, k_i), (e_r, e_i), ls2[:, 0], Q)
