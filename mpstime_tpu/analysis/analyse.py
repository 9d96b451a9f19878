"""Entanglement-entropy analysis (reference src/Analysis/analyse.jl).

TPU-native design notes:
 * Bipartite entropies come from ONE left-to-right canonical sweep
   (lax.scan of QR + Gram-eigh), not the reference's per-site
   re-orthogonalization loop (analyse.jl:27-44) — O(T chi^3) total.
 * Single-site RDMs come from the same sweep; their eigen-spectra are one
   batched [T, d, d] eigvalsh.
 * ``see_variation`` replaces the reference's per-prefix ``precondition`` +
   re-orthogonalize (analyse.jl:180-193) with trace-metric environments and a
   vmap over the measured-prefix length: conditioning on sites < k is a rank-1
   (projected) transfer step, tracing is the full transfer step, and the SEE
   at site j is the spectrum of  E_k[j] . W[j] . R[j+1] . W[j]^H  normalized.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mps import MPS, SingleMPS, expand_label_index
from ..training.fit import TrainedMPS

_LOGFNS = {"log": np.log, "log2": np.log2, "log10": np.log10}


def _log_base_factor(logfn: str) -> float:
    if logfn not in _LOGFNS:
        raise ValueError("logfn must be one of: log, log2, log10")
    return {"log": 1.0, "log2": 1.0 / math.log(2), "log10": 1.0 / math.log(10)}[logfn]


def _entropy_from_p(p: np.ndarray, factor: float, tol: float = 1e-12) -> np.ndarray:
    """-sum p log p over the last axis, ignoring p <= tol (analyse.jl:36-41)."""
    p = np.where(p > tol, p, 1.0)   # log(1) = 0 contribution
    return -np.sum(p * np.log(p), axis=-1) * factor


def _fold_center(m: SingleMPS) -> jnp.ndarray:
    return m.cores.at[m.center_pos].set(m.center)


@partial(jax.jit, static_argnames=("center_pos",))
def _canonical_sweep_spectra(cores_full: jnp.ndarray, center_pos: int):
    """One left-to-right sweep: returns (bond_p [T, chi], site_rho [T, d, d]).

    bond_p[t] = squared singular values across the bond (t | t+1);
    site_rho[t] = single-site RDM at site t.  Assumes the MPS is canonical
    with the center at ``center_pos`` and normalized.
    """
    T, chi, d, _ = cores_full.shape
    dtype = cores_full.dtype

    # move the center to site 0 first (right-canonicalize via LQ from the end)
    def rq_step(R, core):
        # core [chi,d,chi]; absorb R from the right: C = core . R
        C = jnp.einsum("aib,bc->aic", core, R)
        M = C.reshape(chi, d * chi)
        # LQ via reduced QR of M^H: M = L Q with Q [chi, d*chi] row-orthonormal
        Q, Rh = jnp.linalg.qr(M.conj().T)
        newcore = Q.conj().T.reshape(chi, d, chi)
        return Rh.conj().T, newcore

    def scan_rq(R, core):
        R2, newcore = rq_step(R, core)
        return R2, newcore

    R0 = jnp.eye(chi, dtype=dtype)
    R_final, right_cores = jax.lax.scan(scan_rq, R0, cores_full[::-1])
    right_cores = right_cores[::-1]
    # center at site 0: C0 = R_final absorbed into the leftmost core
    C = jnp.einsum("ab,bic->aic", R_final, right_cores[0])
    # overwrite site 0 with the center; sites 1.. are right-orthogonal
    cores_rc = right_cores

    def fwd_step(C, t):
        # bond spectrum at cut (t | t+1): Gram of M [chi*d, chi]
        M = C.reshape(chi * d, chi)
        G = M.conj().T @ M
        w = jnp.linalg.eigvalsh(G)[::-1]
        # single-site rho at t: trace out both bonds of the center
        rho = jnp.einsum("aib,ajb->ij", C, jnp.conj(C))
        # QR split; absorb R into the next core
        Q, R = jnp.linalg.qr(M)
        nxt = jax.lax.dynamic_index_in_dim(cores_rc, jnp.minimum(t + 1, T - 1),
                                           keepdims=False)
        C_next = jnp.einsum("ab,bic->aic", R, nxt)
        return C_next, (jnp.real(w), rho)

    _, (bond_p, site_rho) = jax.lax.scan(fwd_step, C, jnp.arange(T))
    return bond_p, site_rho


def von_neumann_entropy(m: SingleMPS, logfn: str = "log") -> np.ndarray:
    """Bipartite entanglement entropy at each bond (reference
    von_neumann_entropy, analyse.jl:20-45).  entropy[t] is the entropy of the
    cut between sites 0..t and t+1..T-1 (entropy[T-1] = 0)."""
    factor = _log_base_factor(logfn)
    bond_p, _ = _canonical_sweep_spectra(_fold_center(m), m.center_pos)
    p = np.asarray(bond_p, dtype=np.float64)
    return _entropy_from_p(p, factor)


def bipartite_spectrum(mps: TrainedMPS, logfn: str = "log") -> List[np.ndarray]:
    """Per-class bipartite entanglement entropy (reference analyse.jl:57-67)."""
    _log_base_factor(logfn)
    return [von_neumann_entropy(m, logfn) for m in expand_label_index(mps.mps)]


def rho_correct(rho: np.ndarray, eigentol: Optional[float] = None) -> np.ndarray:
    """Clamp tiny negative RDM eigenvalues; DomainError-equivalent otherwise
    (reference rho_correct, analyse.jl:69-91)."""
    rho = np.asarray(rho)
    if eigentol is None:
        eigentol = math.sqrt(np.finfo(np.float64).eps)
    w, V = np.linalg.eigh(rho)
    if (w >= 0).all():
        return rho
    oot = w[w < -eigentol]
    if oot.size:
        raise ValueError(
            f"RDM contains large negative eigenvalues outside of the tolerance "
            f"{eigentol}: lambda = {oot}")
    w = np.clip(w, eigentol, None)
    rho_c = (V * w) @ V.conj().T
    if not np.isclose(np.trace(rho_c).real, 1.0, atol=0.01):
        raise ValueError(f"Tr(rho_corrected) != 1.0 ({np.trace(rho_c)})")
    return rho_c


def one_site_rdm(m: SingleMPS, site: int) -> np.ndarray:
    """Single-site RDM at ``site`` (reference one_site_rdm, analyse.jl:102-109)."""
    _, site_rho = _canonical_sweep_spectra(_fold_center(m), m.center_pos)
    return rho_correct(np.asarray(site_rho[site]))


def single_site_entropy(m: SingleMPS, eigentol: Optional[float] = None
                        ) -> np.ndarray:
    """SEE(t) = -tr(rho_t log rho_t) for every site (reference
    single_site_entropy, analyse.jl:111-120)."""
    if eigentol is None:
        eigentol = math.sqrt(np.finfo(np.float64).eps)
    _, site_rho = _canonical_sweep_spectra(_fold_center(m), m.center_pos)
    rho = np.asarray(site_rho, dtype=np.complex128 if
                     np.iscomplexobj(np.asarray(site_rho)) else np.float64)
    w = np.linalg.eigvalsh(rho)
    if (w < -eigentol).any():
        raise ValueError("RDM contains large negative eigenvalues outside of "
                         f"the tolerance {eigentol}")
    w = np.clip(w, 0.0, None)
    return _entropy_from_p(w, 1.0)


def single_site_spectrum(mps: TrainedMPS) -> List[np.ndarray]:
    """Per-class single-site entanglement entropy spectrum
    (reference single_site_spectrum, analyse.jl:141-149)."""
    return [single_site_entropy(m) for m in expand_label_index(mps.mps)]


# ---------------------------------------------------------------------------
# SEE variation under incremental measurement


@partial(jax.jit, static_argnames=())
def _see_variation_kernel(cores_full: jnp.ndarray, phis_c: jnp.ndarray):
    """For every measured-prefix length k (0..T-1) and probe site j >= k,
    the single-site RDM spectrum of the MPS conditioned on sites < k.

    cores_full [T,chi,d,chi] (normalized class MPS, center folded);
    phis_c [T,d]: conj'd encoded measurement outcomes.
    Returns p [T, T, d]: eigenvalues of rho_j given k measured sites
    (rows k, cols j; entries with j < k are garbage — mask outside)."""
    T, chi, d, _ = cores_full.shape
    dtype = cores_full.dtype
    rdt = phis_c.real.dtype

    # right trace environments R[t] (shared across k)
    e0 = jnp.zeros((chi,), dtype).at[0].set(1.0)
    R_T = jnp.outer(e0, jnp.conj(e0))

    def back(Rn, W):
        R = jnp.einsum("aib,bd,cid->ac", W, Rn, jnp.conj(W))
        tr = jnp.maximum(jnp.real(jnp.trace(R)), 1e-300 if rdt == jnp.float64
                         else 1e-30)
        return R / tr.astype(dtype), R / tr.astype(dtype)

    _, Rs_rev = jax.lax.scan(back, R_T, cores_full[::-1])
    R_env = jnp.concatenate([Rs_rev[::-1], R_T[None]], axis=0)  # [T+1,chi,chi]

    def per_k(k):
        # left env E [chi, chi]: projected for t < k, traced for k <= t < j
        E0 = jnp.outer(e0, jnp.conj(e0))

        def fwd(E, t):
            W = cores_full[t]
            # rho_j candidate at this site (before stepping)
            rho = jnp.einsum("ac,aib,bd,cjd->ij", E, W, R_env[t + 1], jnp.conj(W))
            tr = jnp.maximum(jnp.real(jnp.trace(rho)), 1e-300 if rdt == jnp.float64
                             else 1e-30)
            rho = rho / tr.astype(dtype)
            p = jnp.linalg.eigvalsh(rho)[::-1]
            # step: project if t < k else trace
            w_proj = jnp.einsum("aib,i->ab", W, phis_c[t])
            E_proj = jnp.einsum("ab,ac,cd->bd", w_proj, E, jnp.conj(w_proj))
            E_trace = jnp.einsum("aib,ac,cid->bd", W, E, jnp.conj(W))
            E2 = jnp.where(t < k, E_proj, E_trace)
            tre = jnp.maximum(jnp.real(jnp.trace(E2)), 1e-300 if rdt == jnp.float64
                              else 1e-30)
            return E2 / tre.astype(dtype), jnp.real(p)

        _, ps = jax.lax.scan(fwd, E0, jnp.arange(T))
        return ps                                        # [T, d]

    return jax.vmap(per_k)(jnp.arange(T))                # [T, T, d]


def see_variation(mps: TrainedMPS, measure_series: np.ndarray,
                  class_label=None) -> np.ndarray:
    """SEE at each probe site after measuring the first k sites
    (reference see_variation, analyse.jl:168-194).

    Returns [n_instances, T, T]: out[i, k, j] is the SEE at site j of the
    class MPS conditioned on the first k measured values of instance i
    (out[i, 0, :] is the unmeasured baseline); entries with j < k are 0.
    """
    from ..encodings import encode_series
    from ..utils.preprocessing import transform_test_data

    measure_series = np.atleast_2d(np.asarray(measure_series, dtype=np.float64))
    if class_label is None:
        class_label = mps.labels[0]
    ci = int(np.where(mps.labels == class_label)[0][0])
    m = expand_label_index(mps.mps)[ci]
    cores_full = _fold_center(m)
    T = m.T
    opts = mps.opts

    X_scaled, _ = transform_test_data(measure_series, mps.norms, opts)

    out = np.zeros((measure_series.shape[0], T, T))
    for i in range(measure_series.shape[0]):
        phis = encode_series(X_scaled[i], opts, mps.train_data.enc_args,
                             spec=mps.encoding_spec(),
                             class_idx=ci if opts.encode_classes_separately else 0,
                             dtype=mps.mps.dtype)
        p = np.asarray(_see_variation_kernel(cores_full, jnp.conj(phis)),
                       dtype=np.float64)                  # [T, T, d]
        ent = _entropy_from_p(np.clip(p, 0.0, None), 1.0)  # [T, T]
        # zero out j < k (measured sites have no remaining entropy)
        k_idx, j_idx = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
        ent = np.where(j_idx >= k_idx, ent, 0.0)
        out[i] = ent
    return out
