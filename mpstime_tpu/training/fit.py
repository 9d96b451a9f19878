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
from .sweep import (WARM_ALGS, full_sweep, full_sweep_warm, full_sweeps,
                    init_subspaces)


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


def _pad_sample_axis(phis_c, y_onehot, class_weight, npad, real_dt):
    """Pad the sample axis with ``npad`` zero-weight copies of the first
    sample: every contraction stays finite while the copies contribute
    exactly nothing to the loss/gradient (w = 0)."""
    if not npad:
        return phis_c, y_onehot, class_weight
    phis_c = jnp.concatenate(
        [phis_c, jnp.repeat(phis_c[:, :1], npad, axis=1)], axis=1)
    y_onehot = jnp.concatenate(
        [y_onehot, jnp.repeat(y_onehot[:1], npad, axis=0)], axis=0)
    class_weight = jnp.concatenate(
        [class_weight, jnp.zeros((npad,), real_dt)], axis=0)
    return phis_c, y_onehot, class_weight


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
        phis_c, y_onehot, class_weight = _pad_sample_axis(
            phis_c, y_onehot, class_weight, target - N, real_dt)

    if mesh is not None:
        from ..parallel import replicate, shard_train_arrays
        n_dev = int(np.prod(list(mesh.shape.values())))
        # pad from the CURRENT sample-axis length (pad_samples_to may have
        # grown it past N) so the shard axis is always divisible by n_dev
        n_cur = phis_c.shape[1]
        phis_c, y_onehot, class_weight = _pad_sample_axis(
            phis_c, y_onehot, class_weight, (-n_cur) % n_dev, real_dt)
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
    if verb >= 1:
        # the fused-kernel eligibility set is narrow; a config that falls
        # off it silently costs ~5-10x sweep time at chi>=64 — say so once
        from .sweep import pallas_route_notice
        notice = pallas_route_notice(
            mps.cores.dtype, opts.loss_grad, opts.bbopt, opts.update_iters,
            opts.rescale, sweep_kw["svd_alg"], platform,
            C=mps.center.shape[3], chi=mps.cores.shape[1], d=opts.d,
            N=phis_c.shape[1], track_cost=opts.track_cost,
            ritz_track_rot=opts.resolved_ritz_rots()[1])
        if notice:
            print(notice)
    eta_a = jnp.asarray(opts.eta, dtype=real_dt)
    cutoff_a = jnp.asarray(opts.cutoff, dtype=np.float64
                           if real_dt == np.float64 else np.float32)
    # No per-sweep host work needed?  Fuse all sweeps into ONE device call
    # (per-call dispatch is pure overhead; see training/sweep.py full_sweeps).
    # exit_early and track_cost both need per-sweep host visibility.
    fuse_sweeps = (opts.log_level <= 0 and not opts.exit_early
                   and verb <= -1 and not opts.track_cost)
    if fuse_sweeps and opts.nsweeps > 0:
        exact_rot, track_rot = opts.resolved_ritz_rots()
        if mesh is not None:
            from ..parallel.mesh import sharded_full_sweeps
            cores, center = sharded_full_sweeps(
                mesh, cores, center, phis_c, y_onehot, class_weight,
                eta_a, cutoff_a, nsweeps=opts.nsweeps,
                refresh_every=opts.subspace_refresh_every,
                ritz_exact_sweeps=opts.ritz_exact_sweeps,
                ritz_exact_rot=exact_rot, ritz_track_rot=track_rot,
                **sweep_kw)
        else:
            # donate: the (multi-MB at large chi) core stack + center are
            # dead after this call — XLA aliases them with the outputs
            cores, center = full_sweeps(
                cores, center, phis_c, y_onehot, class_weight, eta_a,
                cutoff_a, nsweeps=opts.nsweeps, platform=platform,
                refresh_every=opts.subspace_refresh_every,
                ritz_exact_sweeps=opts.ritz_exact_sweeps,
                ritz_exact_rot=exact_rot, ritz_track_rot=track_rot,
                max_rank=max_rank, donate=True, **sweep_kw)
        jax.block_until_ready(center)
        mps = MPS(cores, center, T - 1)
    else:
        warm = sweep_kw["svd_alg"] in WARM_ALGS
        exact_rot, track_rot = opts.resolved_ritz_rots()
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
            # exact->track schedule for the ritz route (same host-side rule
            # as full_sweeps' traced cond; ritz_rot is a no-op off it)
            rrot = (track_rot
                    if (sweep_kw["svd_alg"] == "randomized_warm_ritz"
                        and 0 <= opts.ritz_exact_sweeps <= sweep)
                    else exact_rot)
            if warm and mesh is not None:
                out = sharded_full_sweep_warm(
                    mesh, cores, center, subspaces, phis_c, y_onehot,
                    class_weight, eta_a, cutoff_a, refresh=refresh,
                    ritz_rot=rrot,
                    track_cost=opts.track_cost, **sweep_kw)
                cores, center, subspaces = out[0], out[1], out[2]
                if opts.track_cost:
                    costs = out[3]
            elif warm:
                out = full_sweep_warm(
                    cores, center, subspaces, phis_c, y_onehot, class_weight,
                    eta_a, cutoff_a, refresh=refresh, ritz_rot=rrot,
                    platform=platform,
                    track_cost=opts.track_cost, max_rank=max_rank,
                    donate=True, **sweep_kw)
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
                    platform=platform, max_rank=max_rank, donate=True,
                    **sweep_kw)
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


# Fields fit_mps_batch allows to differ between jobs: runtime-traced knobs
# (eta, cutoff, the chi_max rank cap) and the init seed.  Everything else
# shapes the compiled program and must be shared.
_BATCH_VARIABLE_FIELDS = ("eta", "cutoff", "chi_max", "init_rng")


def fit_mps_batch(jobs, opts: MPSOptions = None, opts_list=None
                  ) -> list:
    """Train F independent MPS models as ONE vmapped device program.

    ``jobs``: a list of ``(X_train, y_train)`` pairs sharing T and the
    label set; sample counts may differ (each job is padded to the
    largest with zero-weight copies — exact for the KLD loss/gradient).
    ``opts_list``: per-job options differing only in eta / cutoff /
    chi_max / init_rng (the runtime-traced knobs: a padded-hyperopt
    trial population, or CV folds at one config); pass ``opts`` instead
    when all jobs share one config.

    The sweeps run through :func:`training.sweep.batched_full_sweeps`:
    the model axis rides every per-bond op via vmap on the XLA bond path,
    amortizing the op-issue skeleton across models the way the Pallas
    kernels amortize it within a bond — the complementary regime (many
    small fits: hyperopt folds and trial populations; the reference runs
    one sequential fit per (trial, fold), tuning.jl:158-176).  Always the
    fused no-logging path; returns a list of TrainedMPS."""
    from ..utils.compcache import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()

    if opts_list is None:
        opts_list = [opts if opts is not None else MPSOptions()] * len(jobs)
    if len(opts_list) != len(jobs):
        raise ValueError("opts_list must match jobs in length")
    F = len(jobs)
    if F == 0:
        return []
    def _static_key(o):
        dd = o.to_dict()
        for f in _BATCH_VARIABLE_FIELDS:
            dd.pop(f)
        return dd

    base = _static_key(opts_list[0])
    for o in opts_list[1:]:
        if _static_key(o) != base:
            raise ValueError(
                "fit_mps_batch jobs may differ only in "
                f"{_BATCH_VARIABLE_FIELDS}; other options shape the "
                "compiled program and must be shared")

    # svd_alg="auto" resolves per-job through the complex chi gate
    # (options.COMPLEX_RITZ_CHI_GATE), so a complex trial population whose
    # chi_max straddles it mixes resolved algorithms: partition into one
    # vmapped program per alg (order-preserving) rather than silently
    # routing every job through the first job's resolution.  NOTE: jobs
    # resolving to "randomized_warm_ritz" batch correctly but gain less —
    # vmapped eigh lowers to a per-model loop, so the route's dominant
    # per-bond [k, k] eigh does not amortize across the model axis (the
    # surrounding matmuls and the op-issue skeleton still do).
    algs = [o.resolved_svd_alg() for o in opts_list]
    if len(set(algs)) > 1:
        results: list = [None] * F
        for alg in sorted(set(algs)):
            idx = [i for i, a in enumerate(algs) if a == alg]
            sub = fit_mps_batch([jobs[i] for i in idx],
                                opts_list=[opts_list[i] for i in idx])
            for i, r in zip(idx, sub):
                results[i] = r
        return results

    o0 = opts_list[0]
    spec = get_encoding(o0.encoding, project=o0.projected_basis)
    dtype = o0.resolved_dtype()
    if spec.is_complex and np.dtype(dtype).kind != "c":
        raise ValueError("Using a complex valued encoding but the MPS dtype "
                         "is real. Set a complex dtype in MPSOptions.")
    real_dt = np.dtype(o0.real_dtype())

    # ---- per-job preprocess + encode (host-side, cheap) --------------------
    Xs = [np.asarray(X, np.float64) for X, _ in jobs]
    T = Xs[0].shape[1]
    if any(X.shape[1] != T for X in Xs):
        raise ValueError("all jobs must share the series length T")
    ys = [np.asarray(y) if y is not None
          else np.zeros(X.shape[0], np.int64) for (X, (_, y)) in
          zip(Xs, jobs)]
    labels = np.unique(ys[0])
    C = len(labels)
    dss, normss = [], []
    for X, y in zip(Xs, ys):
        if not np.array_equal(np.unique(y), labels):
            raise ValueError("all jobs must share the label set")
        X_s, _, norms, _ = transform_data(X, np.zeros((0, T)), opts_list[0])
        dss.append(encode_dataset(X, X_s, y, o0, spec=spec, labels=labels,
                                  dtype=dtype))
        normss.append(norms)

    # ---- shared caps + per-job runtime knobs -------------------------------
    pad = o0.pad_to
    chis = [o.chi_max for o in opts_list]
    chi_pad = pad[0] if pad is not None else max(chis)
    d_pad = pad[1] if pad is not None else o0.d
    max_rank = jnp.asarray(chis, jnp.int32)        # always traced (one prog)
    etas = jnp.asarray([o.eta for o in opts_list], real_dt)
    cutoffs = jnp.asarray([o.cutoff for o in opts_list],
                          np.float64 if real_dt == np.float64 else np.float32)

    # ---- stack training tensors (zero-weight sample padding) ---------------
    N_max = max(X.shape[0] for X in Xs)
    N_max += (-N_max) % 8
    phis_l, y1h_l, w_l, cores_l, cen_l = [], [], [], [], []
    for o, X, ds in zip(opts_list, Xs, dss):
        N = X.shape[0]
        phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
        y1h = jax.nn.one_hot(jnp.asarray(ds.y_idx), C, dtype=real_dt)
        counts = ds.class_distribution.astype(np.float64)
        if o.train_classes_separately:
            w = 1.0 / counts[ds.y_idx]
        else:
            w = np.full(N, 1.0 / N)
        w = jnp.asarray(w, real_dt)
        phis_c, y1h, w = _pad_sample_axis(phis_c, y1h, w, N_max - N, real_dt)
        mps = random_mps(o.init_rng, T, o0.d, C, o.chi_init, chi_pad,
                         dtype=dtype, pad_d=None if pad is None else d_pad)
        phis_l.append(phis_c)
        y1h_l.append(y1h)
        w_l.append(w)
        cores_l.append(mps.cores)
        cen_l.append(mps.center)

    from .sweep import batched_full_sweeps
    cores_b, center_b = batched_full_sweeps(
        jnp.stack(cores_l), jnp.stack(cen_l), jnp.stack(phis_l),
        jnp.stack(y1h_l), jnp.stack(w_l), etas, cutoffs,
        nsweeps=o0.nsweeps, loss=o0.loss_grad, bbopt=o0.bbopt,
        update_iters=o0.update_iters, rescale=o0.rescale,
        svd_alg=o0.resolved_svd_alg(),
        power_iters=o0.resolved_power_iters(),
        orth=o0.resolved_orth_alg(),
        refresh_every=o0.subspace_refresh_every,
        ritz_exact_sweeps=o0.ritz_exact_sweeps, max_rank=max_rank)
    float(jnp.linalg.norm(center_b))     # reliable device barrier (axon)

    out = []
    for f, (o, ds, norms) in enumerate(zip(opts_list, dss, normss)):
        mps = MPS(cores_b[f], center_b[f], T - 1).normalize()
        out.append(TrainedMPS(mps, o, norms, ds, None))
    return out
