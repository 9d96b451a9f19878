"""Split (binned) bases: uniform-width and histogram (equal-count) bins with
an auxiliary encoding applied within each bin
(reference src/Encodings/splitbases.jl).

The encoded vector concatenates, over bins, ``select_i(x) * aux_enc(x_local)``
where select is 1 strictly inside bin i, 0.5 on shared edges (so boundary
points keep unit total weight, splitbases.jl:96-108), and x_local rescales the
bin interior to the full encoding domain.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .registry import EncodingSpec


def get_nbins_safely(d: int, aux_basis_dim: int) -> int:
    if d % aux_basis_dim != 0:
        raise ValueError(
            f"The auxiliary basis dimension ({aux_basis_dim}) must evenly "
            f"divide the total feature dimension ({d})")
    return d // aux_basis_dim


def unif_split(X: np.ndarray, nbins: int, a: float, b: float) -> np.ndarray:
    """Equal-width bin edges (reference unif_split, splitbases.jl:51-54)."""
    return np.linspace(a, b, nbins + 1)


def hist_split_1d(samples: np.ndarray, nbins: int, a: float, b: float
                  ) -> np.ndarray:
    """Equal-count (histogram) bin edges for one timepoint's samples
    (reference hist_split, splitbases.jl:56-88)."""
    samples = np.asarray(samples, dtype=np.float64)
    npts = len(samples)
    bin_pts = int(round(npts / nbins))
    if bin_pts == 0:
        warnings.warn("Less than one data point per bin! Putting the extra "
                      "bins at the upper edge")
        bin_pts = 1
    bins = np.full(nbins + 1, a, dtype=np.float64)
    ds = np.sort(samples[(a <= samples) & (samples <= b)])
    j = 1
    for i in range(1, len(ds) + 1):
        if i % bin_pts == 0 and i < npts:
            if j == nbins:
                break
            bins[j] = (ds[i - 1] + ds[i]) / 2
            j += 1
    if j <= nbins - 1:
        bins[bins == a] = b
        bins[0] = a
    bins[-1] = b
    return bins


def hist_split(X: np.ndarray, nbins: int, a: float, b: float) -> np.ndarray:
    """Per-timepoint histogram bins [T, nbins+1]; X is [N, T] (the reference
    passes series-as-columns and iterates rows, splitbases.jl:90-92)."""
    X = np.asarray(X, dtype=np.float64)
    return np.stack([hist_split_1d(X[:, t], nbins, a, b)
                     for t in range(X.shape[1])])


def _project_onto_bins_batch(X, aux_spec: EncodingSpec, aux_dim: int,
                             bins, aux_enc_args, a: float, b: float,
                             timedep_bins: bool):
    """Vectorised split encode: X [N, T] -> [N, T, nbins*aux_dim]."""
    scale = b - a
    bins = jnp.asarray(bins)                   # [nbins+1] or [T, nbins+1]
    if timedep_bins:
        lo = bins[None, :, :-1]                # [1, T, nbins]
        hi = bins[None, :, 1:]
    else:
        lo = bins[None, None, :-1]             # [1, 1, nbins]
        hi = bins[None, None, 1:]
    nbins = lo.shape[-1]
    x = X[..., None]                           # [N, T, 1]
    dx = hi - lo
    # hist_split_1d collapses unfillable bins to zero width (duplicate
    # edges); guard the division and never select a degenerate bin
    deg = dx <= 0
    x_prop = scale * (x - lo) / jnp.where(deg, 1.0, dx)   # interior -> [0, scale]
    frac = x_prop / scale                      # in [0, 1] inside bin i

    inside = (frac > 0) & (frac < 1)
    on_lo = frac == 0
    on_hi = frac == 1
    first = jnp.arange(nbins) == 0
    last = jnp.arange(nbins) == nbins - 1
    # a shared edge normally splits weight 0.5/0.5 with the neighbour; if
    # the neighbour is degenerate it can't take its half
    prev_deg = jnp.concatenate([jnp.ones_like(deg[..., :1]),
                                deg[..., :-1]], axis=-1)
    next_deg = jnp.concatenate([deg[..., 1:],
                                jnp.ones_like(deg[..., :1])], axis=-1)
    select = (inside * 1.0
              + on_lo * jnp.where(first | prev_deg, 1.0, 0.5)
              + on_hi * jnp.where(last | next_deg, 1.0, 0.5))
    select = select * (~deg)

    # aux encoding at the bin-local coordinate a + x_prop, clipped into the
    # domain (clipped values are masked by select anyway)
    x_local = jnp.clip(a + x_prop, a, b)       # [N, T, nbins]
    # encode all bins at once: reshape the bin axis into the batch
    N, T = X.shape
    xl = jnp.moveaxis(x_local, -1, 0).reshape(nbins * N, T)
    enc = aux_spec.encode_batch(xl, aux_dim, aux_enc_args)
    enc = enc.reshape(nbins, N, T, aux_dim)
    enc = jnp.moveaxis(enc, 0, 2)              # [N, T, nbins, aux_dim]
    out = enc * select[..., None].astype(enc.dtype)
    return out.reshape(N, T, nbins * aux_dim)


def make_split_encoding(kind: str, aux: EncodingSpec) -> EncodingSpec:
    """Build a SplitBasis EncodingSpec (reference histogram_split /
    uniform_split, basis_structs.jl:247-276)."""
    if aux.is_data_driven or aux.is_time_dependent:
        raise ValueError("Splitting up a data-driven encoding is not yet "
                         "supported, sorry")
    a, b = aux.range
    is_hist = kind == "hist"
    name = ("Hist Split " if is_hist else "Unif Split ") + aux.name
    timedep = is_hist     # histogram bins are per-timepoint

    def init(X_scaled, y, d, opts):
        nbins = get_nbins_safely(d, opts.aux_basis_dim)
        if is_hist:
            bins = hist_split(X_scaled, nbins, a, b)
        else:
            bins = unif_split(X_scaled, nbins, a, b)
        return {"bins": bins, "aux_basis_dim": opts.aux_basis_dim}

    def encode_batch(X, d, enc_args):
        bins = np.asarray(enc_args["bins"])
        aux_dim = int(enc_args["aux_basis_dim"])
        return _project_onto_bins_batch(X, aux, aux_dim, bins, None, a, b,
                                        timedep_bins=bins.ndim == 2)

    return EncodingSpec(name, aux.is_complex, timedep, True, (a, b),
                        init, encode_batch)
