"""Write a synthetic MPSTime.jl-layout JLD2 checkpoint with h5py.

Reproduces the subset of the JLD2/ITensors on-disk structure that
``mpstime_tpu.models.itensor_import`` reads (see its module docstring):
the top-level ``mps`` compound (opts / mps-ref / train_data), the ITensor
wrapper chain with id-linked indices and reversed SmallString tags, and
Float64 or JLD2-Complex{Float64} (re/im compound) dense storage.  Used to
test the complex import path, for which no real reference fixture is
vendorable offline.
"""

from __future__ import annotations

import numpy as np


def _tag32(s: str) -> np.void:
    """ITensors SmallString: 32 raw bytes, characters reversed."""
    b = bytes(reversed(s.encode()))
    return np.void(b + b"\0" * (32 - len(b)))


def _write_itensor(f, name: str, arr: np.ndarray, inds: list) -> "object":
    """Write one ITensor (wrapper -> tensor -> storage/inds).  ``inds``:
    list of dicts {id, dim, tag}; ``arr`` has the matching shape in inds
    order.  Returns the wrapper dataset's ref."""
    import h5py

    # storage data vector, column-major flattening like Julia
    flat = np.asarray(arr).flatten(order="F")
    if np.iscomplexobj(flat):
        cdt = np.dtype([("re", "<f8"), ("im", "<f8")])
        data = np.empty(flat.shape, dtype=cdt)
        data["re"], data["im"] = flat.real, flat.imag
    else:
        data = flat.astype(np.float64)
    data_ds = f.create_dataset(f"{name}_data", data=data)

    tag_member = np.dtype([("1", np.dtype((np.void, 32)))])
    tags_dt = np.dtype([("length", "<i8"),
                        ("data", np.dtype([("data", tag_member)]))])
    ind_dt = np.dtype([("id", "<u8"), ("space", "<i8"), ("tags", tags_dt)])
    inds_dt = np.dtype([(str(k + 1), ind_dt) for k in range(len(inds))])
    tens_dt = np.dtype([("storage", np.dtype([("data", h5py.ref_dtype)])),
                        ("inds", inds_dt)])
    tens = np.empty((), dtype=tens_dt)
    tens["storage"]["data"] = data_ds.ref
    for k, ind in enumerate(inds):
        iv = tens["inds"][str(k + 1)]
        iv["id"] = ind["id"]
        iv["space"] = ind["dim"]
        iv["tags"]["length"] = 1
        iv["tags"]["data"]["data"]["1"] = _tag32(ind["tag"])
    tens_ds = f.create_dataset(f"{name}_tensor", data=tens)

    wrap_dt = np.dtype([("tensor", h5py.ref_dtype)])
    wrap = np.empty((), dtype=wrap_dt)
    wrap["tensor"] = tens_ds.ref
    wrap_ds = f.create_dataset(name, data=wrap)
    return wrap_ds.ref


def write_synthetic_jld2(path: str, cores: np.ndarray, center: np.ndarray,
                         bond_dims: np.ndarray, X_train: np.ndarray,
                         y_train: np.ndarray, opts) -> None:
    """Write ``path`` in the reference's TrainedMPS JLD2 layout from this
    package's padded cores/center (trimmed to the effective bond dims)."""
    import h5py

    T, _, d, _ = cores.shape
    C = center.shape[3]
    with h5py.File(path, "w") as f:
        # ---- tensor chain -------------------------------------------------
        refs = []
        for t in range(T):
            dl, dr = int(bond_dims[t]), int(bond_dims[t + 1])
            site = dict(id=2000 + t, dim=d, tag=f"Site,n={t + 1}")
            left = dict(id=1000 + t - 1, dim=dl, tag=f"Link,l={t}")
            right = dict(id=1000 + t, dim=dr, tag=f"Link,l={t + 1}")
            if t == 0:
                arr = np.transpose(np.asarray(cores[t])[:dl, :, :dr],
                                   (1, 0, 2))[:, 0, :]      # (site, right)
                inds = [site, right]
            elif t < T - 1:
                arr = np.asarray(cores[t])[:dl, :, :dr]     # (left, site, r)
                inds = [left, site, right]
            else:
                label = dict(id=3000, dim=C, tag="f(x)")
                arr = np.asarray(center)[:dl, :, 0, :]      # (left, site, lab)
                inds = [left, site, label]
            refs.append(_write_itensor(f, f"t{t}", arr, inds))

        vec_ds = f.create_dataset("mps_vec", data=np.asarray(
            refs, dtype=h5py.ref_dtype))
        mps_dt = np.dtype([("data", h5py.ref_dtype)])
        mps_rec = np.empty((), dtype=mps_dt)
        mps_rec["data"] = vec_ds.ref
        mps_ds = f.create_dataset("mps_obj", data=mps_rec)

        # ---- training data ------------------------------------------------
        xd = f.create_dataset("Xtr", data=np.asarray(X_train,
                                                     np.float64).T)
        ps_dt = np.dtype([("label", "<i8")])
        ps_refs = []
        for i, lab in enumerate(np.asarray(y_train).tolist()):
            rec = np.empty((), dtype=ps_dt)
            rec["label"] = int(lab)
            ps_refs.append(f.create_dataset(f"ps{i}", data=rec).ref)
        ts_ds = f.create_dataset("ts_vec", data=np.asarray(
            ps_refs, dtype=h5py.ref_dtype))

        # ---- options ------------------------------------------------------
        enc_ds = f.create_dataset("enc_name",
                                  data=np.bytes_(opts.encoding))
        db_ds = f.create_dataset("db", data=np.asarray(opts.data_bounds,
                                                       np.float64))
        opts_dt = np.dtype([
            ("verbosity", "<i8"), ("nsweeps", "<i8"), ("chi_max", "<i8"),
            ("eta", "<f8"), ("d", "<i8"), ("encoding", h5py.ref_dtype),
            ("aux_basis_dim", "<i8"), ("cutoff", "<f8"),
            ("update_iters", "<i8"), ("projected_basis", "u1"),
            ("track_cost", "u1"),
            ("rescale", np.dtype([("1", "u1"), ("2", "u1")])),
            ("train_classes_separately", "u1"),
            ("encode_classes_separately", "u1"), ("minmax", "u1"),
            ("exit_early", "u1"), ("sigmoid_transform", "u1"),
            ("init_rng", "<i8"), ("chi_init", "<i8"), ("log_level", "<i8"),
            ("data_bounds", h5py.ref_dtype)])
        td_dt = np.dtype([("timeseries", h5py.ref_dtype),
                          ("original_data", h5py.ref_dtype)])
        top_dt = np.dtype([("opts", opts_dt), ("mps", h5py.ref_dtype),
                           ("train_data", td_dt)])
        top = np.empty((), dtype=top_dt)
        o = top["opts"]
        o["verbosity"] = -1
        o["nsweeps"] = opts.nsweeps
        o["chi_max"] = opts.chi_max
        o["eta"] = opts.eta
        o["d"] = opts.d
        o["encoding"] = enc_ds.ref
        o["aux_basis_dim"] = opts.aux_basis_dim
        o["cutoff"] = opts.cutoff
        o["update_iters"] = opts.update_iters
        o["projected_basis"] = int(opts.projected_basis)
        o["track_cost"] = int(opts.track_cost)
        o["rescale"]["1"] = int(opts.rescale[0])
        o["rescale"]["2"] = int(opts.rescale[1])
        o["train_classes_separately"] = int(opts.train_classes_separately)
        o["encode_classes_separately"] = int(opts.encode_classes_separately)
        o["minmax"] = int(opts.minmax)
        o["exit_early"] = int(opts.exit_early)
        o["sigmoid_transform"] = int(opts.sigmoid_transform)
        o["init_rng"] = opts.init_rng
        o["chi_init"] = opts.chi_init
        o["log_level"] = opts.log_level
        o["data_bounds"] = db_ds.ref
        top["mps"] = mps_ds.ref
        top["train_data"]["timeseries"] = ts_ds.ref
        top["train_data"]["original_data"] = xd.ref
        f.create_dataset("mps", data=top)
