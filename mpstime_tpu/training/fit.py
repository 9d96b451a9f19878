"""fit_mps — the training entry point (reference fitMPS,
RealRealHighDimension.jl:383-890).

Pipeline: preprocess (host) -> encode (device, batched) -> seeded random MPS
-> nsweeps jitted full sweeps -> per-sweep stats -> TrainedMPS.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..encodings import (EncodedDataset, EncodingSpec, encode_dataset,
                         get_encoding)
from ..models.mps import MPS, random_mps
from ..options import MPSOptions
from ..utils.preprocessing import TransformNorms, transform_data
from .stats import loss_acc_conf
from .sweep import full_sweep, full_sweep_warm, full_sweeps, init_subspaces


@dataclass
class TrainedMPS:
    """Trained MPS + options + training-data record (reference ``TrainedMPS``,
    options.jl:422-427).  Stores everything needed to re-encode new data."""
    mps: MPS
    opts: MPSOptions
    norms: TransformNorms
    train_data: EncodedDataset
    custom_encoding: Optional[EncodingSpec] = None

    @property
    def labels(self) -> np.ndarray:
        return self.train_data.labels

    def encoding_spec(self) -> EncodingSpec:
        if self.custom_encoding is not None:
            return self.custom_encoding
        return get_encoding(self.opts.encoding, project=self.opts.projected_basis)


def fit_mps(X_train: np.ndarray, y_train: Optional[np.ndarray] = None,
            X_test: Optional[np.ndarray] = None,
            y_test: Optional[np.ndarray] = None,
            opts: MPSOptions = None,
            custom_encoding: Optional[EncodingSpec] = None,
            mesh=None, test_run: bool = False,
            pad_samples_to: Optional[int] = None
            ) -> Tuple[TrainedMPS, Dict[str, list], EncodedDataset]:
    """Train a label-indexed MPS (reference fitMPS :383).

    X_train: [N, T] series-as-rows.  y_train defaults to all-zeros
    (unsupervised, :416).  X_test/y_test are only used for evaluation logging.
    Returns (trained, info, encoded_test_states); note the test states are
    class-sorted (reference NOTE at :267).

    ``mesh``: a 1-D ``jax.sharding.Mesh`` (see :func:`mpstime_tpu.parallel.
    make_mesh`) to shard the sample axis across devices — the MPS is
    replicated and GSPMD inserts one gradient all-reduce per bond update.
    The sample count is padded to a mesh multiple with zero-weight copies.
    """
    from ..utils.compcache import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()

    if opts is None:
        opts = MPSOptions()
    X_train = np.asarray(X_train, dtype=np.float64)
    N, T = X_train.shape
    if y_train is None:
        y_train = np.zeros(N, dtype=np.int64)
    y_train = np.asarray(y_train)
    if X_test is None:
        X_test = np.zeros((0, T))
        y_test = np.zeros(0, dtype=y_train.dtype)
    X_test = np.asarray(X_test, dtype=np.float64)
    y_test = np.asarray(y_test)

    if custom_encoding is not None and opts.encoding != "custom":
        raise ValueError("To use a custom encoding, set encoding='custom' in MPSOptions")
    spec = custom_encoding if custom_encoding is not None \
        else get_encoding(opts.encoding, project=opts.projected_basis)
    if custom_encoding is not None and \
            opts.custom_encoding_range != tuple(spec.range):
        # stamp the spec's domain so preprocessing scales into it (it
        # travels with TrainedMPS.opts for classify/impute re-encoding)
        opts = opts.replace(custom_encoding_range=tuple(spec.range))

    dtype = opts.resolved_dtype()
    if spec.is_complex and np.dtype(dtype).kind != "c":
        raise ValueError("Using a complex valued encoding but the MPS dtype is real. "
                         "Set a complex dtype in MPSOptions.")

    labels = np.unique(y_train)
    if np.setdiff1d(np.unique(y_test), labels).size:
        raise ValueError("Test set has classes not present in the training set.")
    num_classes = len(labels)
    verb = opts.verbosity

    # ---- preprocess + encode ---------------------------------------------
    X_train_s, X_test_s, norms, _ = transform_data(X_train, X_test, opts)
    train_ds = encode_dataset(X_train, X_train_s, y_train, opts, spec=spec,
                              labels=labels, dtype=dtype)
    test_ds = encode_dataset(X_test, X_test_s, y_test, opts, spec=spec,
                             labels=labels, training_enc_args=train_ds.enc_args,
                             dtype=dtype)

    if test_run:
        # basis-preview mode (reference fitMPS test_run,
        # RealRealHighDimension.jl:500-543): encode, plot the basis, skip
        # training
        from ..vis import plot_encoding
        fig = plot_encoding(spec, opts.d, train_ds.X_scaled, y_train,
                            opts=opts)
        if verb > -1:
            print("Encoding completed! Returning initial states without "
                  "training.")
        return train_ds, test_ds, fig

    # ---- init MPS ---------------------------------------------------------
    if verb > -1:
        print(f"Generating initial weight MPS with bond dimension chi_init = "
              f"{opts.chi_init} using random state {opts.init_rng}.")
    # shape-polymorphic padding: allocate at (chi_cap, d_cap) with chi_max
    # as a runtime truncation cap, so every (chi_max, d) under the caps
    # shares one compiled sweep program (see MPSOptions.pad_to)
    pad = opts.pad_to
    chi_pad = opts.chi_max if pad is None else pad[0]
    d_pad = opts.d if pad is None else pad[1]
    # always traced when padding (a None<->scalar flip would fork the jit
    # cache between cap-sized and smaller trials)
    max_rank = None if pad is None else jnp.asarray(opts.chi_max, jnp.int32)
    if pad is not None and mesh is not None:
        raise ValueError("pad_to (shape-polymorphic trials) does not "
                         "combine with mesh sharding; use one or the other")
    mps = random_mps(opts.init_rng, T, opts.d, num_classes, opts.chi_init,
                     chi_pad, dtype=dtype,
                     pad_d=None if pad is None else d_pad)

    # ---- training tensors -------------------------------------------------
    phis_c = jnp.conj(train_ds.X_enc).swapaxes(0, 1)          # [T, N, d]
    y_idx = train_ds.y_idx
    real_dt = np.dtype(opts.real_dtype())
    y_onehot = jax.nn.one_hot(jnp.asarray(y_idx), num_classes, dtype=real_dt)
    counts = train_ds.class_distribution.astype(np.float64)
    if opts.train_classes_separately:
        w = 1.0 / counts[y_idx]
    else:
        w = np.full(N, 1.0 / N)
    class_weight = jnp.asarray(w, dtype=real_dt)

    if pad is not None or pad_samples_to:
        # pad the sample axis with zero-weight copies so CV folds of
        # slightly different sizes share one compiled program.
        # ``pad_samples_to`` (from tune, which knows every fold's size)
        # guarantees sharing; the multiple-of-8 fallback only helps when
        # the sizes don't straddle a bucket boundary.
        target = max(N, pad_samples_to) if pad_samples_to else N + (-N) % 8
        npad = target - N
        if npad:
            phis_c = jnp.concatenate(
                [phis_c, jnp.repeat(phis_c[:, :1], npad, axis=1)], axis=1)
            y_onehot = jnp.concatenate(
                [y_onehot, jnp.repeat(y_onehot[:1], npad, axis=0)], axis=0)
            class_weight = jnp.concatenate(
                [class_weight, jnp.zeros((npad,), real_dt)], axis=0)

    if mesh is not None:
        from ..parallel import replicate, shard_train_arrays
        n_dev = int(np.prod(list(mesh.shape.values())))
        mesh_pad = (-N) % n_dev
        if mesh_pad:
            # zero-weight copies of the first sample keep every shard's
            # contractions finite while contributing nothing to loss/grad
            phis_c = jnp.concatenate(
                [phis_c, jnp.repeat(phis_c[:, :1], mesh_pad, axis=1)], axis=1)
            y_onehot = jnp.concatenate(
                [y_onehot, jnp.repeat(y_onehot[:1], mesh_pad, axis=0)], axis=0)
            class_weight = jnp.concatenate(
                [class_weight, jnp.zeros((mesh_pad,), real_dt)], axis=0)
        phis_c, y_onehot, class_weight = shard_train_arrays(
            mesh, phis_c, y_onehot, class_weight)

    info: Dict[str, list] = {k: [] for k in
                             ("train_loss", "train_acc", "train_KL_div",
                              "test_loss", "test_acc", "test_KL_div",
                              "test_conf", "time_taken")}
    if opts.track_cost:
        info["bond_costs"] = []
    has_test = len(test_ds) > 0

    def log_stats(elapsed: float) -> float:
        tr_mse, tr_kld, tr_acc, _ = loss_acc_conf(mps, train_ds.X_enc, y_idx)
        info["train_loss"].append(tr_mse)
        info["train_acc"].append(tr_acc)
        info["train_KL_div"].append(tr_kld)
        info["time_taken"].append(elapsed)
        if has_test:
            te_mse, te_kld, te_acc, conf = loss_acc_conf(
                mps, test_ds.X_enc, test_ds.y_idx)
            info["test_loss"].append(te_mse)
            info["test_acc"].append(te_acc)
            info["test_KL_div"].append(te_kld)
            info["test_conf"].append(conf)
            if verb > -1:
                print(f"Training KL Div. {tr_kld} | Training acc. {tr_acc}.")
                print(f"Test KL Div. {te_kld} | Testing acc. {te_acc}.")
        elif verb > -1:
            print(f"Training KL Div. {tr_kld} | Training acc. {tr_acc}.")
        return tr_acc

    if verb > -1:
        print(f"Using {opts.update_iters} iterations per update.")
    if opts.log_level > 0:
        log_stats(0.0)

    # ---- sweeps -----------------------------------------------------------
    cores, center = mps.cores, mps.center
    if mesh is not None:
        from ..parallel import replicate
        from ..parallel.mesh import mesh_platform
        cores, center = replicate(mesh, cores, center)
        platform = mesh_platform(mesh)
    else:
        from .sweep import resolve_platform
        platform = resolve_platform()
    sweep_kw = dict(loss=opts.loss_grad, bbopt=opts.bbopt,
                    update_iters=opts.update_iters, rescale=opts.rescale,
                    svd_alg=opts.resolved_svd_alg(),
                    power_iters=opts.resolved_power_iters(),
                    orth=opts.resolved_orth_alg())
    eta_a = jnp.asarray(opts.eta, dtype=real_dt)
    cutoff_a = jnp.asarray(opts.cutoff, dtype=np.float64
                           if real_dt == np.float64 else np.float32)
    # No per-sweep host work needed?  Fuse all sweeps into ONE device call
    # (per-call dispatch is pure overhead; see training/sweep.py full_sweeps).
    # exit_early and track_cost both need per-sweep host visibility.
    fuse_sweeps = (opts.log_level <= 0 and not opts.exit_early
                   and verb <= -1 and not opts.track_cost)
    if fuse_sweeps and opts.nsweeps > 0:
        if mesh is not None:
            from ..parallel.mesh import sharded_full_sweeps
            cores, center = sharded_full_sweeps(
                mesh, cores, center, phis_c, y_onehot, class_weight,
                eta_a, cutoff_a, nsweeps=opts.nsweeps,
                refresh_every=opts.subspace_refresh_every, **sweep_kw)
        else:
            cores, center = full_sweeps(
                cores, center, phis_c, y_onehot, class_weight, eta_a,
                cutoff_a, nsweeps=opts.nsweeps, platform=platform,
                refresh_every=opts.subspace_refresh_every,
                max_rank=max_rank, **sweep_kw)
        jax.block_until_ready(center)
        mps = MPS(cores, center, T - 1)
    else:
        warm = sweep_kw["svd_alg"] == "randomized_warm"
        subspaces = (init_subspaces(T, chi_pad, d_pad, dtype)
                     if warm else None)
        if mesh is not None:
            from ..parallel.mesh import (sharded_full_sweep,
                                         sharded_full_sweep_warm)
        for sweep in range(opts.nsweeps):
            if verb > -1:
                print(f"Starting sweep [{sweep + 1}/{opts.nsweeps}] "
                      f"(optimiser {opts.bbopt}, loss {opts.loss_grad})")
            t0 = time.perf_counter()
            costs = None
            refresh = sweep % opts.subspace_refresh_every == 0
            if warm and mesh is not None:
                out = sharded_full_sweep_warm(
                    mesh, cores, center, subspaces, phis_c, y_onehot,
                    class_weight, eta_a, cutoff_a, refresh=refresh,
                    track_cost=opts.track_cost, **sweep_kw)
                cores, center, subspaces = out[0], out[1], out[2]
                if opts.track_cost:
                    costs = out[3]
            elif warm:
                out = full_sweep_warm(
                    cores, center, subspaces, phis_c, y_onehot, class_weight,
                    eta_a, cutoff_a, refresh=refresh, platform=platform,
                    track_cost=opts.track_cost, max_rank=max_rank,
                    **sweep_kw)
                cores, center, subspaces = out[0], out[1], out[2]
                if opts.track_cost:
                    costs = out[3]
            elif mesh is not None:
                out = sharded_full_sweep(
                    mesh, cores, center, phis_c, y_onehot, class_weight,
                    eta_a, cutoff_a, track_cost=opts.track_cost, **sweep_kw)
                cores, center = out[0], out[1]
                if opts.track_cost:
                    costs = out[2]
            else:
                out = full_sweep(
                    cores, center, phis_c, y_onehot, class_weight,
                    eta_a, cutoff_a, track_cost=opts.track_cost,
                    platform=platform, max_rank=max_rank, **sweep_kw)
                cores, center = out[0], out[1]
                if opts.track_cost:
                    costs = out[2]
            # scalar transfer as the timing barrier: block_until_ready is
            # unreliable on the remote axon TPU platform
            float(jnp.linalg.norm(center))
            elapsed = time.perf_counter() - t0
            mps = MPS(cores, center, T - 1)
            if opts.track_cost:
                # per-bond loss trace (reference track_cost prints the cost
                # during updates, loss_functions.jl:50; we emit the whole
                # sweep's trace in bond-update order)
                costs = np.asarray(costs)
                info["bond_costs"].append(costs)
                if verb >= 1:
                    print(f"Sweep {sweep + 1} bond costs: first "
                          f"{costs[0]:.6g}, last {costs[-1]:.6g}, "
                          f"mean {costs.mean():.6g}")
            if verb > -1:
                print(f"Finished sweep {sweep + 1}. Time for sweep: "
                      f"{elapsed:.2f}s")
            tr_acc = log_stats(elapsed) if opts.log_level > 0 else None
            if opts.exit_early:
                # reference checks train_acc == 1 every sweep regardless of
                # stat logging (RealRealHighDimension.jl:847-849)
                if tr_acc is None:
                    _, _, tr_acc, _ = loss_acc_conf(mps, train_ds.X_enc,
                                                    y_idx)
                if tr_acc == 1.0:
                    if verb > -1:
                        print("Early exit: train accuracy reached 1.0 "
                              f"after sweep {sweep + 1}.")
                    break

    mps = mps.normalize()
    if verb > -1:
        print("\nMPS normalised!\n")
    if opts.log_level > 0:
        log_stats(float("nan"))

    trained = TrainedMPS(mps, opts, norms, train_ds, custom_encoding)
    return trained, info, test_ds
