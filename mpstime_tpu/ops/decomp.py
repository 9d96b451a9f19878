"""Truncated two-site splits for the DMRG sweep.

Replaces ITensor's truncated SVD (reference decomposeBT,
RealRealHighDimension.jl:146-203).  TPU-first design decisions:

 * Static shapes: we always produce exactly ``keep`` (= chi_max) singular
   directions; truncation (both the chi_max cap and the relative ``cutoff``
   on squared singular values, matching ITensor semantics) is applied as a
   mask that zeroes dropped directions.  Zeroed directions stay exactly zero
   through subsequent contractions, so padding is self-masking.

 * The default algorithm is an eigendecomposition of the *Gram matrix* on the
   smaller side.  This is much faster than SVD on TPU and, crucially, never
   divides by a singular value: for a left-split we return
   ``US = M @ V`` and ``Vh = V^H``; for a right-split ``U`` and
   ``SVh = U^H @ M``.  The truncation decision uses the Gram eigenvalues,
   which *are* the squared singular values ITensor's cutoff is defined on.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _trunc_mask(w_desc: jnp.ndarray, keep: int, cutoff,
                max_rank=None) -> jnp.ndarray:
    """Truncation mask over descending squared singular values.

    ITensor keeps the minimal rank r with sum_{k>r} p_k <= cutoff * sum(p)
    (relative truncation error on squared singular values); additionally
    r <= keep.  ``max_rank`` (optional, may be a TRACED scalar) caps the
    rank further at runtime — the shape-polymorphic path runs at a padded
    static ``keep`` = chi_cap with the trial's chi_max as max_rank.
    Returns a 0/1 mask of length len(w_desc)."""
    w = jnp.maximum(w_desc.real, 0.0)
    total = jnp.sum(w)
    # suffix[i] = sum_{k>=i} w_k ; discard index i iff suffix[i] <= cutoff*total
    suffix = total - (jnp.cumsum(w) - w)
    keep_cut = suffix > cutoff * total
    idx = jnp.arange(w.shape[0])
    mask = keep_cut & (idx < keep) & (w > 0)
    if max_rank is not None:
        mask = mask & (idx < max_rank)
    return mask.astype(w.dtype)


def _fixed_sketch(shape, dtype) -> jnp.ndarray:
    """Deterministic Gaussian sketch matrix (host constant; the same sketch
    serves every bond — the power iterations wash out any fixed-sketch bias)."""
    rng = np.random.default_rng(20240817)
    om = rng.standard_normal(shape)
    if np.dtype(dtype).kind == "c":
        om = om + 1j * rng.standard_normal(shape)
    from ..utils.xfer import to_device
    return to_device(om, dtype)


def _qr_orth(Y: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of the columns of Y — the Q of a reduced QR.  Any
    column-NESTED orthonormal basis serves the randomized/lean/warm splits
    (the MPS gauge freedom absorbs intra-span rotations), which licenses a
    faster complex route:

    complex QR on TPU lowers to a loop-heavy kernel (~40x the real QR's
    in-program cost per bond, measured on v5e), so complex inputs take a
    REAL Householder QR of the realified embedding instead.  The [2R, 2k]
    embedding interleaves each complex column y with i*y; Householder
    nesting then makes real columns (2j, 2j+1) an orthonormal basis of the
    realified span increment of y_j, and any real unit vector in the
    realification of a 1-dim complex span is the realification of a unit
    complex multiple of its generator — so the even columns' halves are
    exactly the (Re, Im) parts of a nested complex-orthonormal basis.

    The argument above assumes the columns of Y are numerically full rank.
    On a (near-)rank-deficient Y — e.g. exactly-zero truncated directions
    of a padded bond — the real QR's fill-in columns for the deficient
    tail need not respect the complex structure, so the extracted basis
    can carry non-complex-orthonormal junk in those positions.  This is
    benign for every caller here: junk fill-in is still orthogonal to the
    realified span of the leading (valid) columns, so its Rayleigh
    quotient against M is ~0 and the ITensor cutoff mask
    (``_trunc_mask``'s ``w > 0`` term) discards those directions before
    they touch the split factors.  Callers needing a certified
    complex-orthonormal Q for a deficient Y should use
    ``jnp.linalg.qr`` directly."""
    if not jnp.iscomplexobj(Y):
        Q, _ = jnp.linalg.qr(Y)
        return Q
    R, k = Y.shape
    Yr, Yi = jnp.real(Y), jnp.imag(Y)
    top = jnp.stack([Yr, -Yi], axis=2).reshape(R, 2 * k)
    bot = jnp.stack([Yi, Yr], axis=2).reshape(R, 2 * k)
    Qr, _ = jnp.linalg.qr(jnp.concatenate([top, bot], axis=0))
    Qe = Qr[:, ::2]
    return jax.lax.complex(Qe[:R], Qe[R:]).astype(Y.dtype)


#: Quintic Newton-Schulz coefficients (aggressive singular-value inflation;
#: the polynomial a*x + b*x^3 + c*x^5 maps (0, 1] into (0, ~1.18] and
#: multiplies tiny singular values by ~a per step).
_NS_QA, _NS_QB, _NS_QC = 3.4445, -4.7750, 2.0315
#: Iteration counts PER POWER STEP: quintic warmup steps inflate
#: sigma_min by ~3.44 each, then cubic cleanup steps converge
#: quadratically to orthonormality; with the revival bound
#: kappa <= ~1/_NS_REVIVE (below), 8+6 reaches f32-roundoff
#: orthogonality with margin (measured: 6+6 covers kappa 1e4).
_NS_QUINTIC, _NS_CUBIC = 8, 6
#: The NS route runs the warm refresh as SUBSPACE ITERATION — NS polar
#: orthonormalization after EVERY power step, not column normalization
#: with one orthogonalization at the end — plus an eps*Y_prev revival
#: before each NS.  Two failure modes of the naive end-orthogonalized
#: form demand this (both measured, ECG200):
#:
#: * Death spiral: the warm split caches Q as the next sweep's V0, and a
#:   direction NS leaves unconverged (near-null in Y) comes back as a
#:   near-ZERO cached column that the power step can never resurrect —
#:   subspace rank collapses over sweeps (fourier train-acc 0.91 -> 0.32;
#:   QR avoids it via orthonormal fill-in).  The eps*Y_prev term keeps
#:   every cached direction alive and bounds kappa(input) at ~1/eps.
#: * Gram resolution floor: NS works through X^H X, which is blind to
#:   column amplitudes below ~sqrt(eps_f32) ~ 2e-4.  After q
#:   column-normalized power steps Y's amplitude ratios are the
#:   (2q)-th power of the bond spectrum's, so an END-of-loop NS at q=3
#:   (the complex default) caps subspace resolution at relative energies
#:   ~(2e-4)^(1/3) ~ 6e-2 and fourier underfits (0.33 train acc).
#:   Orthonormalizing BETWEEN steps resets the dynamic range each step,
#:   giving per-step resolution ~2e-4 in energy — finer than the f32
#:   END-QR's own (6e-8)^(1/3) ~ 4e-3 floor.  Measured: fourier f32
#:   subspace-iteration NS 0.73/0.64 train/test == the QR route's
#:   0.72/0.66; legendre 0.87 test vs QR 0.84.
_NS_REVIVE = 1e-3


def ns_orth(Y: jnp.ndarray, n_quintic: int = _NS_QUINTIC,
            n_cubic: int = _NS_CUBIC) -> jnp.ndarray:
    """Matmul-only polar orthogonalization (Newton-Schulz iteration).

    Returns an orthonormal basis of span(Y) — the unitary polar factor
    Y (Y^H Y)^(-1/2), reached by iterating odd matrix polynomials in
    Y^H Y.  Serves the same role as :func:`_qr_orth` (any orthonormal
    basis of the span works for the randomized/lean/warm splits; the MPS
    gauge freedom absorbs the difference), with two structural advantages:

    * every op is a matmul, so it runs INSIDE the fused Pallas bond
      kernels (in-kernel twins in ops/pallas_bond.py /_c.py), removing
      the per-bond XLA QR dispatch — the one op that forced a
      K1 -> QR -> K2 kernel split;
    * on complex input the iteration is complex-structure-preserving by
      construction (all ops are complex matmuls), so the rank-deficient
      fill-in hazard of the realified-Householder route (_qr_orth
      docstring) does not arise: exactly-zero directions stay exactly
      zero and the downstream cutoff mask discards them.

    Convergence: singular values of the iterate approach 1 from
    sigma/||Y|| — the quintic warmup multiplies small ones by ~3.44 per
    step, the cubic tail is quadratically convergent.  With the default
    counts, sigma_min/sigma_max >= ~1e-4 reaches f32-roundoff
    orthonormality; smaller directions (numerically rank-deficient)
    collapse toward zero columns instead of being filled in.

    Matmuls run at HIGHEST precision: on TPU the default f32 matmul is
    bf16-based, whose ~1e-3 rounding would cap the achievable
    orthogonality three decades short.
    """
    hi = jax.lax.Precision.HIGHEST
    dot = partial(jnp.dot, precision=hi)
    rdt = Y.real.dtype
    nf = jnp.sqrt(jnp.sum(jnp.abs(Y) ** 2)) * rdt.type(1.0 + 1e-3)
    X = Y / jnp.maximum(nf, jnp.finfo(rdt).tiny)
    eye = jnp.eye(Y.shape[1], dtype=Y.dtype)
    for _ in range(n_quintic):
        G = dot(X.conj().T, X)
        G2 = dot(G, G)
        X = dot(X, _NS_QA * eye + _NS_QB * G + _NS_QC * G2)
    for _ in range(n_cubic):
        G = dot(X.conj().T, X)
        X = 1.5 * X - 0.5 * dot(X, G)
    return X


def _orth(Y: jnp.ndarray, orth: str) -> jnp.ndarray:
    """Basis-of-span dispatcher for the randomized/lean/warm splits."""
    if orth == "ns":
        return ns_orth(Y)
    return _qr_orth(Y)


def _power_orth(mm, Y0: jnp.ndarray, q: int, orth: str) -> jnp.ndarray:
    """Orthonormal basis of the q-step power iterate of Y0 under ``mm``
    (one application of M^H M or M M^H).

    orth="qr": the plain chain — q applications, one end normalization,
    one QR — exactly the historical cold-split arithmetic.

    orth="ns": SUBSPACE ITERATION — per-step normalization + eps*Y revival
    + NS polar after every step, the same form the warm splits use.  An
    end-of-loop NS on the chained iterate is NOT an option: after q steps
    the iterate's condition number is the (2q+1)-th power of the bond
    spectrum's, far beyond NS's ~1e4 convergence reach, so mid-band
    directions would leave non-orthonormal (neither unit nor zero) and the
    split would stop being an isometry (see the _NS_REVIVE comment)."""
    if orth == "ns":
        Y = Y0 / jnp.maximum(jnp.linalg.norm(Y0, axis=0, keepdims=True),
                             jnp.finfo(Y0.real.dtype).tiny)
        eps = Y.real.dtype.type(_NS_REVIVE)
        for _ in range(q):
            Z = mm(Y)
            Z = Z / jnp.maximum(jnp.linalg.norm(Z, axis=0, keepdims=True),
                                jnp.finfo(Z.real.dtype).tiny)
            Y = ns_orth(Z + eps * Y)
        return Y
    for _ in range(q):
        Y0 = mm(Y0)
    # per-column normalization keeps the QR input away from f32
    # under/overflow (power iteration raises the dynamic range to ~2q+1)
    Y0 = Y0 / jnp.maximum(jnp.linalg.norm(Y0, axis=0, keepdims=True),
                          jnp.finfo(Y0.real.dtype).tiny)
    return _orth(Y0, orth)


def _sketch_k(keep: int, other: int) -> int:
    """Sketch width: keep + max(keep/8, 8) oversampling, capped by the small
    dimension.  With q=2 power iterations this small oversampling already
    gives near-optimal subspaces (classic randomized-SVD p=5..10 rule), and
    the downstream QR/eigh cost scales with the sketch width."""
    return min(keep + max(keep // 8, 8), other)


def randomized_split_left(M: jnp.ndarray, keep: int, cutoff, q: int = 2,
                          max_rank=None, orth: str = "qr"
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomized truncated split (column side): find an orthonormal basis of
    the dominant right-singular subspace by sketched power iteration, then
    Rayleigh-Ritz for ordering/cutoff.

    ~10x faster than QDWH-eigh of the [C, C] Gram on TPU for C ~ 320: the cost
    is a handful of MXU matmuls + QR[C, k] + eigh[k, k] with k ~ 1.5*keep.
    The Ritz values approximate the squared singular values, so the cutoff
    mask keeps ITensor semantics; the split M ~ (M Q)(Q^H) stays an exact
    isometry split (Q orthonormal), only the *discarded* subspace is
    approximate — which DMRG's sweeping self-corrects."""
    R, C = M.shape
    k = _sketch_k(keep, C)
    if k >= C:
        return split_bond_left(M, keep, cutoff, "gram_eigh", max_rank=max_rank)
    Psi = _fixed_sketch((R, k), M.dtype)
    Q = _power_orth(lambda Yp: M.conj().T @ (M @ Yp),
                    M.conj().T @ Psi, q, orth)    # [C, k]
    B = M @ Q                                     # [R, k]
    S = B.conj().T @ B                            # [k, k] ritz Gram
    w, W = jnp.linalg.eigh(S)
    w = w[::-1]
    W = W[:, ::-1]
    mask = _trunc_mask(w, keep, cutoff, max_rank)
    Qt = Q @ (W[:, :keep] * mask[:keep])          # [C, keep] masked ritz basis
    US = M @ Qt
    Vh = Qt.conj().T
    if keep > k:
        US = jnp.pad(US, ((0, 0), (0, keep - k)))
        Vh = jnp.pad(Vh, ((0, keep - k), (0, 0)))
    return US, Vh


def randomized_split_right(M: jnp.ndarray, keep: int, cutoff, q: int = 2,
                           max_rank=None, orth: str = "qr"
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mirror of :func:`randomized_split_left` on the row side: orthonormal
    U [R, keep] spanning the dominant left-singular subspace, SVh = U^H M."""
    R, C = M.shape
    k = _sketch_k(keep, R)
    if k >= R:
        return split_bond_right(M, keep, cutoff, "gram_eigh", max_rank=max_rank)
    Psi = _fixed_sketch((C, k), M.dtype)
    Q = _power_orth(lambda Yp: M @ (M.conj().T @ Yp),
                    M @ Psi, q, orth)             # [R, k]
    B = Q.conj().T @ M                            # [k, C]
    S = B @ B.conj().T                            # [k, k]
    w, W = jnp.linalg.eigh(S)
    w = w[::-1]
    W = W[:, ::-1]
    mask = _trunc_mask(w, keep, cutoff, max_rank)
    Ut = Q @ (W[:, :keep] * mask[:keep])
    SVh = Ut.conj().T @ M
    if keep > k:
        Ut = jnp.pad(Ut, ((0, 0), (0, keep - k)))
        SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
    return Ut, SVh


def lean_split_left(M: jnp.ndarray, keep: int, cutoff, q: int = 2,
                    max_rank=None, orth: str = "qr"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomized split without the Rayleigh-Ritz eigh.

    Key observation: the Ritz rotation never changes the *span* of the
    sketched subspace — it only orders directions within it so the top
    ``keep`` survive truncation.  With sketch width == keep there is nothing
    to order: Q [C, keep] itself is the kept isometry (MPS gauge freedom
    absorbs the intra-span mixing), so the per-bond eigh disappears and the
    split is q+1 MXU matmul passes + one QR — ~3x faster per sweep than the
    Ritz path on TPU (the [k,k] eigh was ~2/3 of each bond's critical path).

    q is capped at 2: in float32 the power iteration raises singular-value
    ratios to the (2q+1)-th power, and beyond q=2 trailing in-span
    directions underflow, collapsing the effective bond rank (measured:
    q=3+ loses training accuracy, q<=2 matches the Ritz path).

    The reference ``cutoff`` (relative truncation of squared singular
    values, decomposeBT RealRealHighDimension.jl:166-187) is applied through
    column energies ||M Q_i||^2: exact for dead directions (rank < keep,
    which must stay exactly zero to preserve the padding invariant), and for
    live ones a Ritz-value proxy that only differs on directions within
    cutoff of zero."""
    R, C = M.shape
    k = min(keep, C)
    Psi = _fixed_sketch((R, k), M.dtype)
    Q = _power_orth(lambda Yp: M.conj().T @ (M @ Yp),
                    M.conj().T @ Psi, q, orth)    # [C, k]
    B = M @ Q                                     # [R, k] = U S (mixed)
    w = jnp.sum(jnp.abs(B) ** 2, axis=0)          # column energies
    order = jnp.argsort(-w)
    w_desc = w[order]
    mask = _trunc_mask(w_desc, keep, cutoff, max_rank)
    keep_col = jnp.zeros((k,), w.dtype).at[order].set(mask)
    US = B * keep_col
    Vh = Q.conj().T * keep_col[:, None]
    if keep > k:
        US = jnp.pad(US, ((0, 0), (0, keep - k)))
        Vh = jnp.pad(Vh, ((0, keep - k), (0, 0)))
    return US, Vh


def lean_split_right(M: jnp.ndarray, keep: int, cutoff, q: int = 2,
                     max_rank=None, orth: str = "qr"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mirror of :func:`lean_split_left` on the row side."""
    R, C = M.shape
    k = min(keep, R)
    Psi = _fixed_sketch((C, k), M.dtype)
    Q = _power_orth(lambda Yp: M @ (M.conj().T @ Yp),
                    M @ Psi, q, orth)             # [R, k]
    B = Q.conj().T @ M                            # [k, C] = S Vh (mixed)
    w = jnp.sum(jnp.abs(B) ** 2, axis=1)
    order = jnp.argsort(-w)
    w_desc = w[order]
    mask = _trunc_mask(w_desc, keep, cutoff, max_rank)
    keep_col = jnp.zeros((k,), w.dtype).at[order].set(mask)
    U = Q * keep_col
    SVh = B * keep_col[:, None]
    if keep > k:
        U = jnp.pad(U, ((0, 0), (0, keep - k)))
        SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
    return U, SVh


def _warm_power(mm, Y: jnp.ndarray, q: int, orth: str) -> jnp.ndarray:
    """The warm splits' subspace refresh: q power steps of ``mm`` (one
    application of M^H M or M M^H) from the cached basis Y, with per-STEP
    column normalization (q > 1 raises the dynamic range to the (2q)-th
    power otherwise, overflowing f32 mid-iteration).  orth="ns" instead
    runs SUBSPACE ITERATION — eps*Y revival + NS polar after every step
    (see the _NS_REVIVE comment for why); other orths orthogonalize once
    at the end."""
    eps = Y.real.dtype.type(_NS_REVIVE)
    for _ in range(q):
        Z = mm(Y)
        Z = Z / jnp.maximum(jnp.linalg.norm(Z, axis=0, keepdims=True),
                            jnp.finfo(Z.real.dtype).tiny)
        Y = ns_orth(Z + eps * Y) if orth == "ns" else Z
    return Y if orth == "ns" else _orth(Y, orth)


def warm_split_left(M: jnp.ndarray, V0: jnp.ndarray, keep: int, cutoff,
                    q: int = 1, refresh: bool = True, max_rank=None,
                    orth: str = "qr"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warm-started eigh-free split (column side).

    Like :func:`lean_split_left` but the sketch is the *previous sweep's*
    subspace V0 [C, keep] for this bond instead of a cold random matrix:
    one power step per sweep then accumulates across sweeps, so the kept
    subspace converges to the dominant one as the DMRG sweeps iterate —
    the sweeping itself supplies the missing power iterations.  This closes
    the quality gap cold lean splits show at small chi (slowly decaying
    spectra) while still avoiding the per-bond Rayleigh-Ritz eigh that
    dominates the Ritz path's critical time.

    Returns (US, Vh, V_next) where V_next [C, keep] is the unmasked
    orthonormal basis to cache for the next sweep."""
    C = M.shape[1]
    k = min(keep, C)
    if refresh:
        Q = _warm_power(lambda Yp: M.conj().T @ (M @ Yp),
                        V0[:, :k], q, orth)            # [C, k]
    else:
        # frozen sweep: split directly against the cached orthonormal basis
        # (no power step, no QR); the cadence is set by the caller
        Q = V0[:, :k]
    B = M @ Q
    w = jnp.sum(jnp.abs(B) ** 2, axis=0)
    order = jnp.argsort(-w)
    mask = _trunc_mask(w[order], keep, cutoff, max_rank)
    keep_col = jnp.zeros((k,), w.dtype).at[order].set(mask)
    US = B * keep_col
    Vh = Q.conj().T * keep_col[:, None]
    if keep > k:
        US = jnp.pad(US, ((0, 0), (0, keep - k)))
        Vh = jnp.pad(Vh, ((0, keep - k), (0, 0)))
        Q = jnp.pad(Q, ((0, 0), (0, keep - k)))
    return US, Vh, Q


def warm_split_right(M: jnp.ndarray, U0: jnp.ndarray, keep: int, cutoff,
                     q: int = 1, refresh: bool = True, max_rank=None,
                     orth: str = "qr"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mirror of :func:`warm_split_left` on the row side; U0 [R, keep]."""
    R = M.shape[0]
    k = min(keep, R)
    if refresh:
        Q = _warm_power(lambda Yp: M @ (M.conj().T @ Yp),
                        U0[:, :k], q, orth)            # [R, k]
    else:
        Q = U0[:, :k]
    B = Q.conj().T @ M
    w = jnp.sum(jnp.abs(B) ** 2, axis=1)
    order = jnp.argsort(-w)
    mask = _trunc_mask(w[order], keep, cutoff, max_rank)
    keep_col = jnp.zeros((k,), w.dtype).at[order].set(mask)
    U = Q * keep_col
    SVh = B * keep_col[:, None]
    if keep > k:
        U = jnp.pad(U, ((0, 0), (0, keep - k)))
        SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
        Q = jnp.pad(Q, ((0, 0), (0, keep - k)))
    return U, SVh, Q


#: Orthogonal-iteration steps per bond for the ritz ``rot="track"`` route.
#: Two steps square the per-sweep convergence ratio; the cached basis
#: carries the accumulated rotation across sweeps, so the effective
#: iteration count grows with the sweep number while eigenvalue clusters
#: (where convergence is slow) are exactly the gauge-free directions that
#: need no resolution.
_RITZ_TRACK_ITERS = 2


def _ritz_rot_track(S: jnp.ndarray,
                    iters: int = _RITZ_TRACK_ITERS
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigh-free approximate eigendecomposition of a hermitian PSD
    S [k, k] -> (w descending, W unitary) by ORTHOGONAL (simultaneous)
    ITERATION, tracking the eigenbasis across DMRG sweeps instead of
    recomputing it.

    The ritz route caches the ROTATED basis (warm_ritz_split_* returns
    ``Vnext = Q @ W``), so the next sweep's projected Gram at the same
    bond is the previous eigenbasis perturbed by one optimizer step + one
    warm power step — nearly diagonal with a descending-ish diagonal.
    From that start, QR-based simultaneous iteration

        W <- qr(S @ W).Q        (W0 = qr(S).Q)

    polishes the full basis toward the eigenbasis: the QR's NESTED column
    spans give the classic subspace convergence (column j converges at the
    eigenvalue-ratio rate of its gap), it is globally convergent — unlike
    a first-order Jacobi correction, which was measured to stall in a bad
    basis after the exact->track handoff (fourier chi=64 f64 seed 777:
    train acc 0.31) — and within degenerate clusters, where convergence is
    slow, ANY orthonormal cluster basis is valid for truncation (the MPS
    gauge freedom absorbs intra-cluster mixing).  The returned values are
    the Rayleigh quotients diag(W^H S W), argsorted descending — the sort
    repairs any residual misordering before the cutoff mask.

    Cost: ``iters`` [k, k] matmuls + realified-Householder QRs
    (:func:`_qr_orth`) + one argsort per bond — no eigh, so on TPU the
    ritz route's per-bond complex QDWH eigh (measured ~90% of its 0.47-
    0.56 s/sweep at fourier chi=64 on v5e) leaves the steady-state
    critical path.  Cold-start ordering quality is the sweep engine's
    job: it runs exact eigh sweeps first (``ritz_exact_sweeps``), after
    which tracking maintains the band."""
    hi = jax.lax.Precision.HIGHEST
    dot = partial(jnp.dot, precision=hi)
    # normalize the iterate scale (eigenvalues enter the QR at first
    # power only, so overflow needs ~1e38 energies; this guards f32
    # underflow of cutoff-level directions instead)
    rdt = S.real.dtype
    nf = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(S)).real),
                     jnp.finfo(rdt).tiny)
    Sn = S / nf
    W = _qr_orth(Sn)
    for _ in range(iters - 1):
        W = _qr_orth(dot(Sn, W))
    w = jnp.real(jnp.diagonal(dot(W.conj().T, dot(S, W))))
    order = jnp.argsort(-w)
    return w[order], W[:, order]


#: Relative magnitude of the fixed hermitian perturbation that splits
#: structurally-degenerate complex eigenvalue clusters before the
#: realified real eigh (``rot="eigh_r"``), so the J-doubled realified
#: pairs of DIFFERENT complex eigenvectors separate and the every-other-
#: column extraction picks one representative per complex ray.  Per
#: precision: above the eigh backward error (f32 ~6e-8 * ||S||, f64
#: ~1e-15), as far below the trained spectral scales as possible — the
#: perturbation scrambles the ordering of every eigenvalue pair whose
#: true gap is below it, and the r5 f64 oracle measured that cost
#: directly at the old flat 1e-5 (fourier chi=64: eigh_r cells at or
#: below the exact band's floor, scripts/jacobi_oracle.py — which is why
#: eigh_r is an opt-in, not the auto exact rotation).
_EIGH_R_SPLIT = {4: 1e-5, 8: 1e-11}    # real-dtype itemsize -> eps


@functools.lru_cache(maxsize=8)
def _fixed_hermitian_np(k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic unit-norm hermitian (re, im) parts [k, k] (host)."""
    rng = np.random.default_rng(20250819)
    A = rng.standard_normal((k, k)) + 1j * rng.standard_normal((k, k))
    H = (A + A.conj().T) / 2
    H = H / np.linalg.norm(H)
    return np.ascontiguousarray(H.real), np.ascontiguousarray(H.imag)


def _ritz_rot_eigh_realified(S: jnp.ndarray
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact eigendecomposition of a complex hermitian S [k, k] via ONE
    REAL symmetric eigh of the realified embedding [2k, 2k] — on TPU the
    complex QDWH eigh lowers ~7.5x slower than the real one at the ritz
    shapes (measured v5e, k=64: 1691 us vs 226 us per bond,
    scripts/ritz_unit_probe.py), so the ritz route's exact sweeps use this
    on accelerators.
    Realified spectrum = complex spectrum with every eigenvalue doubled
    (the J-pairing): any unit vector (x, y) in a J-invariant 2-dim
    eigenspace realifies x + iy as a unit complex eigenvector, so taking
    every other column of the sorted real eigenbasis gives one complex
    representative per eigenvalue — PROVIDED different complex rays don't
    share a realified eigenvalue cluster.  A fixed eps-hermitian
    perturbation (J-commuting, so the complex structure survives) splits
    structurally-degenerate clusters (fourier's +-frequency pairs) first;
    a final realified-QR pass (:func:`_qr_orth`) polishes the extracted
    basis to complex orthonormality (cross-eigenvalue orthogonality is
    automatic; the QR only mixes within residual clusters — gauge)."""
    k = S.shape[0]
    rdt = S.real.dtype
    nf = jnp.maximum(jnp.linalg.norm(S), jnp.finfo(rdt).tiny)
    eps = rdt.type(_EIGH_R_SPLIT[np.dtype(rdt).itemsize])
    Hr, Hi = _fixed_hermitian_np(k)
    Sr = jnp.real(S) + (eps * nf) * jnp.asarray(Hr, rdt)
    Si = jnp.imag(S) + (eps * nf) * jnp.asarray(Hi, rdt)
    R = jnp.block([[Sr, -Si], [Si, Sr]])
    w, V = jnp.linalg.eigh(R)                       # ascending
    w = w[::-1]
    V = V[:, ::-1]                                  # descending, J-pairs adjacent
    cand = V[:, ::2]                                # [2k, k]
    Vc = jax.lax.complex(cand[:k], cand[k:]).astype(S.dtype)
    W = _qr_orth(Vc)
    # exact Rayleigh quotients of the UNperturbed S (the mask must see the
    # true energies, not the eps-shifted ones)
    hi = jax.lax.Precision.HIGHEST
    wq = jnp.real(jnp.diagonal(
        jnp.dot(W.conj().T, jnp.dot(S, W, precision=hi), precision=hi)))
    order = jnp.argsort(-wq)
    return wq[order], W[:, order]


#: Odd-even adjacent-pair Jacobi rounds per bond for ``rot="jacobi"``.
#: Each round exactly diagonalizes (and descending-sorts) every touched
#: 2x2 block; alternating offsets make the schedule an odd-even
#: transposition sort, so eigenvalues drifting <= _JACOBI_ROUNDS/2
#: positions per sweep stay tracked.  6 rounds measured in the exact band
#: on the f64 oracle (scripts/jacobi_oracle.py).
_JACOBI_ROUNDS = 6

#: Rounds for ``rot="jacobi_warm"`` — the cold-start variant used on the
#: first ``ritz_exact_sweeps`` sweeps in place of an exact eigh: enough
#: odd-even rounds to eigen-order a warm-split basis (ordered by column
#: energy, i.e. near-sorted) from scratch, so the entire schedule can
#: stay matmul-only (and, on TPU, entirely inside the fused pair
#: kernels).  24 rounds = migration distance 12; validated on the f64
#: oracle (scripts/jacobi_oracle.py round 2).
_JACOBI_WARM_ROUNDS = 24


def _jacobi_round(S: jnp.ndarray, W: jnp.ndarray, off: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One round of exact 2x2 Jacobi rotations on the adjacent disjoint
    pairs (i, i+1), i = off, off+2, ...: S <- J^H S J, W <- W J.

    Every op is a (complex) matmul or elementwise math — Mosaic-expressible,
    which is the point: this is the tracker the fused Pallas pair kernels
    can run in-kernel (the orthogonal-iteration tracker's Householder QR
    cannot).  The rotation's first column is always the mu_plus
    eigenvector, so each touched pair leaves descending — the schedule
    doubles as an odd-even transposition sort."""
    k = S.shape[0]
    cdt = S.dtype
    rdt = S.real.dtype
    idx = jnp.arange(k)
    first = ((idx >= off) & ((idx - off) % 2 == 0) & (idx + 1 < k))
    alpha = jnp.real(jnp.diagonal(S))
    beta = jnp.roll(alpha, -1)
    woff = jnp.concatenate([jnp.diagonal(S, 1),
                            jnp.zeros((1,), cdt)])          # w_i = S[i, i+1]
    aw = jnp.abs(woff)
    half = (alpha - beta) / 2
    root = jnp.sqrt(half * half + aw * aw)
    mu_p = (alpha + beta) / 2 + root
    # branch by conditioning: alpha >= beta -> v+ ~ (mu_p - beta, conj(w));
    # else v+ ~ (w, mu_p - alpha).  Both are exact mu_plus eigenvectors;
    # the chosen one has norm >= |alpha - beta| / 2 + ... and only
    # degenerates when the pair is already diagonal AND equal (guard -> I).
    d_hi = mu_p - beta                                      # >= 0
    d_lo = mu_p - alpha                                     # >= 0
    use_hi = alpha >= beta
    x = jnp.where(use_hi, d_hi.astype(cdt), woff)
    y = jnp.where(use_hi, jnp.conj(woff), d_lo.astype(cdt))
    n = jnp.sqrt(jnp.abs(x) ** 2 + jnp.abs(y) ** 2)
    live = first & (n > jnp.finfo(rdt).tiny ** 0.5)
    n_safe = jnp.where(live, n, 1.0).astype(cdt)
    x = jnp.where(live, x / n_safe, 1.0)
    y = jnp.where(live, y / n_safe, 0.0)
    # J: column i = (x, y) at rows (i, i+1); column i+1 = (-conj(y), conj(x))
    diag = jnp.where(live, x, jnp.ones((), cdt))
    diag = jnp.where(jnp.roll(live, 1), jnp.roll(jnp.conj(x), 1), diag)
    sub = jnp.where(live, y, 0.0)[:-1]                      # J[i+1, i]
    sup = jnp.where(live, -jnp.conj(y), 0.0)[:-1]           # J[i, i+1]
    J = jnp.diag(diag) + jnp.diag(sup, 1) + jnp.diag(sub, -1)
    hi_p = jax.lax.Precision.HIGHEST
    SJ = jnp.dot(S, J, precision=hi_p)
    S2 = jnp.dot(J.conj().T, SJ, precision=hi_p)
    S2 = (S2 + S2.conj().T) / 2
    return S2, jnp.dot(W, J, precision=hi_p)


def _ritz_rot_jacobi(S: jnp.ndarray, rounds: int = _JACOBI_ROUNDS
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Matmul-only eigen-TRACKER: ``rounds`` alternating odd-even
    adjacent-pair exact Jacobi rounds (:func:`_jacobi_round`).

    Valid in the same regime as the orthogonal-iteration tracker
    (``rot="track"``): the cached basis is near the eigenbasis, i.e. S is
    near-diagonal with near-sorted diagonal — the sweep engine's
    exact->track schedule guarantees it.  There it is *stronger* per
    touched pair (each rotation is an exact 2x2 eigensolve, not an
    iteration step) and — unlike the QR-based tracker — contains no
    Householder factorization, so the fused Pallas pair kernels run it
    in-kernel and the whole tracked-ritz bond step stays fused.  Far
    off-diagonal couplings are not directly annihilated; in the tracked
    regime they are second-order (strong mixing only happens between
    near-degenerate eigenvalues, which a sorted basis keeps adjacent).

    Returns (w, W) in ROUND ORDER — near-descending (each round sorts the
    pairs it touches) but NOT argsorted: the fused kernel twin
    (ops/pallas_bond_c._jacobi_rounds_pair) cannot reorder columns, so the
    XLA route matches it and the callers' truncation mask handles
    out-of-order values (warm_ritz_split_* sorts for the mask decision and
    scatters the 0/1 result back)."""
    rdt = S.real.dtype
    nf = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(S)).real),
                     jnp.finfo(rdt).tiny)
    Sn = S / nf
    W = jnp.eye(S.shape[0], dtype=S.dtype)
    for r in range(rounds):
        Sn, W = _jacobi_round(Sn, W, r % 2)
    w = jnp.real(jnp.diagonal(Sn)) * nf
    return w, W


def _ritz_rot(S: jnp.ndarray, rot: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigen-rotation dispatcher for the ritz splits: exact eigh
    (descending), the realified-eigh exact route (``rot="eigh_r"``, the
    accelerator exact default for complex S), or the eigh-free trackers
    (``rot="track"`` orthogonal iteration / ``rot="jacobi"`` matmul-only
    adjacent-pair Jacobi)."""
    if rot == "track":
        return _ritz_rot_track(S)
    if rot == "jacobi":
        return _ritz_rot_jacobi(S)
    if rot == "jacobi_warm":
        return _ritz_rot_jacobi(S, rounds=_JACOBI_WARM_ROUNDS)
    if rot == "eigh_r" and np.dtype(S.dtype).kind == "c":
        return _ritz_rot_eigh_realified(S)
    w, W = jnp.linalg.eigh(S)
    return w[::-1], W[:, ::-1]


def warm_ritz_split_left(M: jnp.ndarray, V0: jnp.ndarray, keep: int, cutoff,
                         q: int = 1, refresh: bool = True, max_rank=None,
                         orth: str = "qr", rot: str = "eigh"
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`warm_split_left` plus a per-bond Rayleigh-Ritz rotation
    (svd_alg="randomized_warm_ritz").

    The eigh-free warm split orders directions by column energy within
    whatever basis the power refresh produced; on spectra with degenerate
    clusters (fourier's +-frequency pairs) at large chi that in-basis
    ordering wastes kept rank on mixtures.  Here the kept subspace is
    additionally rotated to the Ritz eigenbasis of the [k, k] projected
    Gram S = (M Q)^H (M Q) before the cutoff mask — the Ritz values
    approximate the squared singular values, so truncation recovers
    ITensor's exact-SVD ordering semantics at the cost of one small eigh
    per bond (the reason this is not the accelerator default: the eigh
    forces the XLA bond path, ~an order of magnitude off the fused
    kernels' sweep time — use it for final large-chi complex fits).
    The cached V_next is the FULL rotated basis, so the next sweep's
    refresh starts from Ritz-ordered directions.

    Reference match: decomposeBT's exact truncated SVD ordering
    (/root/reference/src/Training/RealRealHighDimension.jl:166-187) on the
    warm sketched subspace.  Returns (US, Vh, V_next) like warm_split_left.

    ``rot="track"`` replaces the per-bond eigh with the eigh-free orthogonal-iteration
    tracker (:func:`_ritz_rot_track`) — valid once the cached basis is
    eigen-ordered, i.e. after at least one exact-eigh sweep; the sweep
    engine handles the exact->track schedule (``ritz_exact_sweeps``).
    """
    C = M.shape[1]
    k = min(keep, C)
    Q = (_warm_power(lambda Yp: M.conj().T @ (M @ Yp), V0[:, :k], q, orth)
         if refresh else V0[:, :k])                    # [C, k]
    B = M @ Q                                          # [R, k]
    S = B.conj().T @ B                                 # [k, k] Ritz Gram
    w, W = _ritz_rot(S, rot)
    # rot="jacobi" returns w in (near-sorted) round order; decide the mask
    # in sorted order and scatter it back so truncation semantics match
    # the descending-sort rule regardless of the rotation's column order
    order = jnp.argsort(-w)
    mask = jnp.zeros_like(w).at[order].set(
        _trunc_mask(w[order], keep, cutoff, max_rank))
    Wm = W * mask
    US = B @ Wm                                        # [R, k]
    Qt = Q @ Wm                                        # [C, k] masked basis
    Vh = Qt.conj().T
    Vnext = Q @ W                                      # rotated, unmasked
    if keep > k:
        US = jnp.pad(US, ((0, 0), (0, keep - k)))
        Vh = jnp.pad(Vh, ((0, keep - k), (0, 0)))
        Vnext = jnp.pad(Vnext, ((0, 0), (0, keep - k)))
    return US, Vh, Vnext


def warm_ritz_split_right(M: jnp.ndarray, U0: jnp.ndarray, keep: int, cutoff,
                          q: int = 1, refresh: bool = True, max_rank=None,
                          orth: str = "qr", rot: str = "eigh"
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mirror of :func:`warm_ritz_split_left` on the row side; U0 [R, keep]."""
    R = M.shape[0]
    k = min(keep, R)
    Q = (_warm_power(lambda Yp: M @ (M.conj().T @ Yp), U0[:, :k], q, orth)
         if refresh else U0[:, :k])                    # [R, k]
    B = Q.conj().T @ M                                 # [k, C]
    S = B @ B.conj().T                                 # [k, k]
    w, W = _ritz_rot(S, rot)
    order = jnp.argsort(-w)
    mask = jnp.zeros_like(w).at[order].set(
        _trunc_mask(w[order], keep, cutoff, max_rank))
    Wm = W * mask
    U = Q @ Wm
    SVh = Wm.conj().T @ B
    Unext = Q @ W
    if keep > k:
        U = jnp.pad(U, ((0, 0), (0, keep - k)))
        SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
        Unext = jnp.pad(Unext, ((0, 0), (0, keep - k)))
    return U, SVh, Unext


def warm_sketch_init(n: int, keep: int, dtype) -> jnp.ndarray:
    """Orthonormal cold-start subspace [n, min(keep, n)] (padded to keep)."""
    k = min(keep, n)
    rng = np.random.default_rng(20240817)
    Psi = rng.standard_normal((n, k))
    if np.dtype(dtype).kind == "c":
        Psi = Psi + 1j * rng.standard_normal((n, k))
    Q, _ = np.linalg.qr(Psi.astype(dtype))
    if keep > k:
        Q = np.pad(Q, ((0, 0), (0, keep - k)))
    from ..utils.xfer import to_device
    return to_device(Q, dtype)


def split_bond_left(M: jnp.ndarray, keep: int, cutoff,
                    alg: str = "gram_eigh",
                    max_rank=None, orth: str = "qr"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split M [R, C] -> (US [R, keep], Vh [keep, C]) with V column-orthonormal,
    truncated+masked.  Used going left: U*S is absorbed into the new center
    (reference RealRealHighDimension.jl:171-173)."""
    R, C = M.shape
    if alg == "randomized":
        return randomized_split_left(M, keep, cutoff, max_rank=max_rank,
                                     orth=orth)
    if alg == "randomized_lean":
        return lean_split_left(M, keep, cutoff, max_rank=max_rank, orth=orth)
    if alg == "svd":
        U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
        mask = _trunc_mask(S * S, keep, cutoff, max_rank)
        k = min(keep, S.shape[0])
        US = (U[:, :k] * (S[:k] * mask[:k]))
        Vh_m = Vh[:k] * mask[:k, None]
        if k < keep:
            US = jnp.pad(US, ((0, 0), (0, keep - k)))
            Vh_m = jnp.pad(Vh_m, ((0, keep - k), (0, 0)))
        return US, Vh_m

    # Gram on the column side: G = M^H M  [C, C]; eigvecs -> V
    G = M.conj().T @ M
    w, V = jnp.linalg.eigh(G)               # ascending
    w = w[::-1]
    V = V[:, ::-1]
    mask = _trunc_mask(w, keep, cutoff, max_rank)
    k = min(keep, C)
    Vk = V[:, :k] * mask[:k]
    US = M @ Vk                              # = U * S on kept directions
    Vh = Vk.conj().T
    if k < keep:
        US = jnp.pad(US, ((0, 0), (0, keep - k)))
        Vh = jnp.pad(Vh, ((0, keep - k), (0, 0)))
    return US, Vh


def split_bond_right(M: jnp.ndarray, keep: int, cutoff,
                     alg: str = "gram_eigh",
                     max_rank=None, orth: str = "qr"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split M [R, C] -> (U [R, keep], SVh [keep, C]) with U column-orthonormal,
    truncated+masked.  Used going right: S*Vh is absorbed into the new center
    (reference RealRealHighDimension.jl:189-191)."""
    R, C = M.shape
    if alg == "randomized":
        return randomized_split_right(M, keep, cutoff, max_rank=max_rank,
                                      orth=orth)
    if alg == "randomized_lean":
        return lean_split_right(M, keep, cutoff, max_rank=max_rank, orth=orth)
    if alg == "svd":
        U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
        mask = _trunc_mask(S * S, keep, cutoff, max_rank)
        k = min(keep, S.shape[0])
        U_m = U[:, :k] * mask[:k]
        SVh = (S[:k] * mask[:k])[:, None] * Vh[:k]
        if k < keep:
            U_m = jnp.pad(U_m, ((0, 0), (0, keep - k)))
            SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
        return U_m, SVh

    # Gram on the row side: G = M M^H  [R, R]; eigvecs -> U
    G = M @ M.conj().T
    w, U = jnp.linalg.eigh(G)
    w = w[::-1]
    U = U[:, ::-1]
    mask = _trunc_mask(w, keep, cutoff, max_rank)
    k = min(keep, R)
    Uk = U[:, :k] * mask[:k]
    SVh = Uk.conj().T @ M
    if k < keep:
        Uk = jnp.pad(Uk, ((0, 0), (0, keep - k)))
        SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
    return Uk, SVh
