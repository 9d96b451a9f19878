"""Label-indexed Matrix Product State with fixed (padded) shapes.

TPU-native replacement for the reference's ITensors MPS container.  The
reference keeps a label index that travels with the orthogonality center
during the DMRG-style sweep (RealRealHighDimension.jl:19-29, 161-197).  Here
that structure is explicit and static-shaped:

  * ``cores``:  [T, chi, d, chi] — site tensors, padded to chi = chi_max.
                The slot at ``center_pos`` is unused (kept zeroed).
  * ``center``: [chi, d, chi, C] — the orthogonality-center site tensor
                carrying the class axis C.
  * ``center_pos``: which site the center occupies.

Invariants: sites < center_pos are left-orthogonal, sites > center_pos are
right-orthogonal, so ``norm(mps) == norm(center)``.  Bond dimensions smaller
than chi appear as exact zero padding (truncated singular directions are
zeroed), which keeps every contraction masked for free.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class MPS:
    cores: jnp.ndarray        # [T, chi, d, chi]
    center: jnp.ndarray       # [chi, d, chi, C]
    center_pos: int = dataclasses.field(metadata=dict(static=True))

    @property
    def T(self) -> int:
        return self.cores.shape[0]

    @property
    def chi(self) -> int:
        return self.cores.shape[1]

    @property
    def d(self) -> int:
        return self.cores.shape[2]

    @property
    def num_classes(self) -> int:
        return self.center.shape[3]

    @property
    def dtype(self):
        return self.cores.dtype

    def norm(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.center)

    def normalize(self) -> "MPS":
        return MPS(self.cores, self.center / self.norm(), self.center_pos)

    def bond_dims(self) -> np.ndarray:
        """Effective bond dimensions [T+1]: the COUNT of live (nonzero)
        directions at each bond.  The sort-free split algorithms
        (randomized_lean / randomized_warm and the Pallas kernels) zero
        truncated directions in place without compacting the kept ones to
        the front, so the count — the actual bond rank — is the meaningful
        number, not the highest live index."""
        # abs on device: avoids a complex host transfer (unimplemented on
        # the axon platform — see utils/xfer.py) and halves the bytes moved
        cores = np.asarray(jnp.abs(self.cores))
        center = np.asarray(jnp.abs(self.center))
        T, chi = self.T, self.chi
        dims = np.ones(T + 1, dtype=np.int64)
        for t in range(T - 1):
            if t == self.center_pos:
                m = np.abs(center).sum(axis=(0, 1, 3))
            else:
                m = np.abs(cores[t]).sum(axis=(0, 1))
            dims[t + 1] = int(np.count_nonzero(m > 0))
        return dims


def random_mps(seed: int, T: int, d: int, num_classes: int, chi_init: int,
               chi_max: int, dtype=np.float32, pad_d: int = None) -> MPS:
    """Seeded random MPS in right-canonical-to-the-last-site form with the
    label axis attached to the last site (reference
    RealRealHighDimension.jl:1-41).  Host-side numpy at the true (unpadded)
    bond dims, then zero-padded to chi_max.

    ``pad_d``: allocate the site axis at this padded size with exact zeros
    beyond ``d`` (shape-polymorphic training; same seed => same effective
    values as the unpadded MPS)."""
    rng = np.random.default_rng(seed)
    dtype = np.dtype(dtype)
    is_complex = dtype.kind == "c"

    def randn(*shape):
        x = rng.standard_normal(shape)
        if is_complex:
            x = x + 1j * rng.standard_normal(shape)
        return x.astype(dtype)

    # true bond dims for a chi_init MPS (ends pinched to 1)
    dims = [1]
    for t in range(1, T):
        dims.append(int(min(chi_init, d ** t, d ** (T - t))))
    dims.append(1)

    site_tensors = [randn(dims[t], d, dims[t + 1]) for t in range(T)]
    # attach label axis to the last site
    label_site = randn(dims[T - 1], d, 1, num_classes)

    # normalize globally (cheap: norm of full contraction of random tensors is
    # intractable exactly; instead normalize per-site then fix after
    # orthogonalization, matching the reference's normalize! + orthogonalize!)
    # left-orthogonalize sites 0..T-2 via QR, absorbing R into the next site
    for t in range(T - 1):
        A = site_tensors[t]
        chi_l, _, chi_r = A.shape
        M = A.reshape(chi_l * d, chi_r)
        Q, R = np.linalg.qr(M)
        k = Q.shape[1]
        site_tensors[t] = Q.reshape(chi_l, d, k)[:, :, :chi_r] if k >= chi_r \
            else np.pad(Q.reshape(chi_l, d, k), ((0, 0), (0, 0), (0, chi_r - k)))
        Rfull = R if k >= chi_r else np.pad(R, ((0, chi_r - k), (0, 0)))
        # normalize the absorbed factor each step: the product of ~T R-factors
        # overflows float32 otherwise, and only the final norm matters (the
        # whole MPS is normalized below).
        rnorm = np.linalg.norm(Rfull)
        if rnorm > 0:
            Rfull = Rfull / rnorm
        if t + 1 < T - 1:
            site_tensors[t + 1] = np.einsum("ab,bic->aic", Rfull[:chi_r, :],
                                            site_tensors[t + 1])
        else:
            label_site = np.einsum("ab,bicl->aicl", Rfull[:chi_r, :], label_site)

    label_site = label_site / np.linalg.norm(label_site)

    chi = chi_max
    d_out = d if pad_d is None else int(pad_d)
    cores = np.zeros((T, chi, d_out, chi), dtype=dtype)
    for t in range(T - 1):
        A = site_tensors[t]
        cores[t, :A.shape[0], :d, :A.shape[2]] = A
    center = np.zeros((chi, d_out, chi, num_classes), dtype=dtype)
    center[:label_site.shape[0], :d, :1, :] = label_site

    from ..utils.xfer import to_device
    return MPS(to_device(cores), to_device(center), T - 1)


# ---------------------------------------------------------------------------
# contraction


def _boundary(chi: int, dtype) -> jnp.ndarray:
    return jnp.zeros((chi,), dtype=dtype).at[0].set(1.0)


@partial(jax.jit, static_argnames=("center_pos",))
def _contract_batch(cores: jnp.ndarray, center: jnp.ndarray, center_pos: int,
                    phis: jnp.ndarray):
    """Batched full MPS-product-state contraction with per-sample log-scales.

    ``phis``: [N, T, d] encoded states.  Returns (yhat_scaled [N, C],
    logscale [N]) where the true contraction value is
    yhat_scaled * exp(logscale) = sum over the network of W * conj(phi)
    (reference contract_mps, summary.jl:4-14 — the product state enters
    conjugated).  The scaled form avoids exponential under/overflow in T.
    """
    T, chi = cores.shape[0], cores.shape[1]
    N = phis.shape[0]
    phis_c = jnp.conj(phis).astype(cores.dtype)
    rdt = phis.real.dtype

    def normalize(v, ls):
        nrm = jnp.linalg.norm(v, axis=1, keepdims=True)
        safe = jnp.where(nrm > 0, nrm, 1.0)
        return v / safe, ls + jnp.log(safe[:, 0]).real

    vL = jnp.broadcast_to(_boundary(chi, cores.dtype), (N, chi))
    lsL = jnp.zeros((N,), rdt)
    if center_pos > 0:
        def left_step(carry, xs):
            v, ls = carry
            core, ph = xs
            tmp = jnp.einsum("na,aib->nib", v, core)
            v2 = jnp.einsum("nib,ni->nb", tmp, ph)
            return normalize(v2, ls), None
        (vL, lsL), _ = jax.lax.scan(
            left_step, (vL, lsL),
            (cores[:center_pos], phis_c[:, :center_pos].swapaxes(0, 1)))

    vR = jnp.broadcast_to(_boundary(chi, cores.dtype), (N, chi))
    lsR = jnp.zeros((N,), rdt)
    if center_pos < T - 1:
        def right_step(carry, xs):
            v, ls = carry
            core, ph = xs
            tmp = jnp.einsum("aib,nb->nai", core, v)
            v2 = jnp.einsum("nai,ni->na", tmp, ph)
            return normalize(v2, ls), None
        (vR, lsR), _ = jax.lax.scan(
            right_step, (vR, lsR),
            (cores[center_pos + 1:][::-1],
             phis_c[:, center_pos + 1:][:, ::-1].swapaxes(0, 1)))

    # y[n,c] = vL[n,a] conj(phi[n,p,i]) center[a,i,b,c] vR[n,b]
    tmp = jnp.einsum("na,aibc->nibc", vL, center)
    tmp = jnp.einsum("nibc,ni->nbc", tmp, phis_c[:, center_pos])
    yhat = jnp.einsum("nbc,nb->nc", tmp, vR)
    return yhat, lsL + lsR


def contract_batch_scaled(mps: MPS, phis: jnp.ndarray):
    """(yhat_scaled [N, C], logscale [N]) for encoded states [N, T, d]."""
    return _contract_batch(mps.cores, mps.center, mps.center_pos, phis)


def contract_batch(mps: MPS, phis: jnp.ndarray) -> jnp.ndarray:
    """True-scale yhat [N, C].  May under/overflow for very long series on an
    untrained MPS; prefer contract_batch_scaled where magnitudes matter."""
    yhat, ls = _contract_batch(mps.cores, mps.center, mps.center_pos, phis)
    return yhat * jnp.exp(ls).astype(yhat.real.dtype)[:, None].astype(yhat.dtype)


def expand_label_index(mps: MPS) -> list:
    """Per-class normalized MPS list (reference utils.jl:356-370): fix the
    label index to each class value and renormalize."""
    out = []
    for c in range(mps.num_classes):
        center_c = mps.center[:, :, :, c]
        nrm = jnp.linalg.norm(center_c)
        out.append(SingleMPS(mps.cores, center_c / nrm, mps.center_pos))
    return out


@jax.tree_util.register_dataclass
@dataclass
class SingleMPS:
    """An unlabeled MPS (single class slice); same canonical structure."""
    cores: jnp.ndarray        # [T, chi, d, chi]
    center: jnp.ndarray       # [chi, d, chi]
    center_pos: int = dataclasses.field(metadata=dict(static=True))

    @property
    def T(self) -> int:
        return self.cores.shape[0]

    @property
    def chi(self) -> int:
        return self.cores.shape[1]

    @property
    def d(self) -> int:
        return self.cores.shape[2]

    def norm(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.center)

    def site(self, t: int) -> jnp.ndarray:
        """Site tensor at t ([chi, d, chi]); the center slot returns center."""
        if t == self.center_pos:
            return self.center
        return self.cores[t]


def single_contract_batch_scaled(m: SingleMPS, phis: jnp.ndarray):
    """(yhat_scaled [N], logscale [N]) for an unlabeled MPS — the true
    overlap is yhat_scaled * exp(logscale)."""
    center4 = m.center[..., None]
    yhat, ls = _contract_batch(m.cores, center4, m.center_pos, phis)
    return yhat[:, 0], ls


def single_contract_batch(m: SingleMPS, phis: jnp.ndarray) -> jnp.ndarray:
    """Overlap <psi|conj(phi_states)> for an unlabeled MPS -> [N] (true scale).
    May underflow to 0 at large T in float32; prefer the scaled variant when
    comparing magnitudes."""
    yhat, ls = single_contract_batch_scaled(m, phis)
    return yhat * jnp.exp(ls).astype(yhat.dtype)
