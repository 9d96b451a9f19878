"""Benchmark: DMRG training sweep + batched imputation wall-clock on TPU.

Primary workload: ECG200 classification (T=96 sites, N=100 train samples,
C=2, d=5 Legendre) at chi_max=64 — the BASELINE.md north-star config.
Also reported:
 * chi=32 and chi=128 on the same data (bond-dimension scaling),
 * a long-sequence synthetic workload (T=512, N=100) at chi=64,
 * an IPD-shaped synthetic workload (T=24, N=67 — the shape of the
   reference's published sweep anchor; real IPD is not vendorable offline),
 * the batched imputation kernel (impute_batch — the hyperopt
   ImputationLoss hot path, B=35 instances x 20% MAR, dx=1e-4),
 * a virtual 8-device CPU mesh datapoint (subprocess) certifying the
   sharded production path end-to-end — CORRECTNESS ONLY (the virtual
   devices share one host's cores, so its wall-clock is meaningless as a
   perf number; keys are prefixed mesh_check_).

Reference anchor: the Julia implementation's published sweep wall-clock is
0.66-1.16 s/sweep (mean 0.80 s) on CPU for the IPD-sized run
(src/Training/RealRealHighDimension.jl:367-379) — the only recoverable
wall-clock number, so vs_baseline = 0.80 / our chi=64 ECG200 sweep time
(>1 means faster, on a ~20x larger workload than the anchor's).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def synth_two_sine(rng, n_a, n_b, T, t_max=2 * np.pi):
    """Two-class synthetic workload (sin(t+phase) vs sin(3t+phase) + noise)
    — the IPD-shaped / long-T benchmark generator, shared by every datapoint
    that uses it (and by scripts/block_tpu_probe.py) so the shapes cannot
    silently diverge."""
    t_ax = np.linspace(0, t_max, T)
    X = np.concatenate([
        np.sin(t_ax[None] + rng.uniform(0, 6, (n_a, 1))),
        np.sin(3 * t_ax[None] + rng.uniform(0, 6, (n_b, 1)))])
    X += 0.1 * rng.standard_normal(X.shape)
    return X, np.repeat([0, 1], [n_a, n_b])


def _sync(x):
    """block_until_ready is a no-op on some remote platforms; transfer a
    scalar as a reliable barrier."""
    import jax.numpy as jnp
    return float(jnp.linalg.norm(x))


def _steady_sweep_time(X, y, chi, d, nsweeps_block=8, reps=5,
                       measure_percall=True, encoding="legendre",
                       refresh_every=1, svd_alg=None):
    """Median s/sweep of the production training path: all sweeps fused into
    one compiled device call (training/sweep.py full_sweeps — what fit_mps
    uses whenever per-sweep host logging is off, e.g. all of hyperopt).
    Also returns the single-sweep-per-call time (includes per-call host
    dispatch, ~10-30 ms on the remote TPU service).  ``encoding`` picks the
    dtype path: legendre = f32 (fused Pallas kernels), fourier = complex64
    (XLA bond path via the real-imag boundary shims)."""
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.training.sweep import full_sweep, full_sweeps
    from mpstime_tpu.utils.preprocessing import transform_data

    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, encoding=encoding,
                         dtype="float32" if encoding == "legendre" else None,
                         svd_alg=svd_alg or "auto")
    dt = opts.resolved_dtype()
    rdt = np.zeros(0, dt).real.dtype
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts, dtype=dt)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, dt)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(C)[ds.y_idx], rdt)
    w = jnp.full((N,), 1.0 / N, rdt)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg=opts.resolved_svd_alg(),
              power_iters=opts.resolved_power_iters(),
              orth=opts.resolved_orth_alg(),
              refresh_every=refresh_every,
              # the shipped exact->track ritz schedule (fit_mps passes this
              # too); full_sweeps' own default is -1 = eigh every sweep,
              # which is the parity route, NOT the production default
              ritz_exact_sweeps=opts.ritz_exact_sweeps,
              # production rotations (r5): accelerators resolve to
              # (eigh_r, jacobi) — the jacobi-tracked sweeps run fused
              # (K12cr); full_sweeps' own defaults are the r4 XLA pair
              ritz_exact_rot=opts.resolved_ritz_rots()[0],
              ritz_track_rot=opts.resolved_ritz_rots()[1])
    eta = jnp.asarray(opts.eta, rdt)
    cutoff = jnp.asarray(opts.cutoff, rdt)

    # fused path (warm + timed).  donate=True is the production setting
    # (fit_mps donates) — the rep loop chains (cores, center) through the
    # calls because donated inputs are deleted; sweep time is
    # state-independent (static shapes), so chaining measures the same
    # thing re-feeding mps.cores did.
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nsweeps_block,
                                donate=True, **kw)
    _sync(center)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(cores, center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nsweeps_block,
                                    donate=True, **kw)
        _sync(center)
        times.append(time.perf_counter() - t0)
    t_fused = float(np.median(times)) / nsweeps_block

    t_percall = None
    if measure_percall:
        # full_sweep has no refresh cadence and no exact->track schedule
        # (both are multi-sweep concepts; a single sweep per call always
        # refreshes, and full_sweep does not accept either kwarg — the r4
        # bench lost its chi=64 headline to exactly this TypeError)
        kw1 = {k: v for k, v in kw.items()
               if k not in ("refresh_every", "ritz_exact_sweeps",
                            "ritz_exact_rot", "ritz_track_rot")}
        # warm call keeps donate off: (cores, center) feed the final
        # accuracy check below and must survive
        cores1, center1 = full_sweep(cores, center, phis_c, y_onehot, w,
                                     eta, cutoff, **kw1)
        _sync(center1)
        times1 = []
        for _ in range(reps):
            t0 = time.perf_counter()
            cores1, center1 = full_sweep(cores1, center1, phis_c, y_onehot,
                                         w, eta, cutoff, donate=True, **kw1)
            _sync(center1)
            times1.append(time.perf_counter() - t0)
        t_percall = float(np.median(times1))

    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.training.stats import loss_acc_conf
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc,
                                 ds.y_idx)
    return t_fused, t_percall, float(acc)


#: Peak dense-matmul throughput used for the MFU estimate, FLOP/s.  v5e
#: (TPU v5 lite) peak is ~197 TFLOP/s bf16 per chip; XLA's default f32
#: matmul on TPU runs bf16-based passes, so the bf16 peak is the honest
#: utilization denominator for this workload.
_PEAK_FLOPS = 197e12


def _sweep_flops(T, N, chi, d, C, q=1, ns_iters=14, cplx=False):
    """Estimated useful FLOPs of ONE production sweep (fused warm path,
    KLD+TSGO, q power steps, NS orth) — a LOWER bound counting only the
    structural matmuls (yhat + gradient, warm power step, NS polar, split
    products, env update); elementwise work and the blocked-route K12m
    re-contractions are ignored.  mul+add = 2 FLOPs.  Complex pair kernels
    do 4 real matmuls per complex one (factor 4)."""
    R, Cc, k = chi * d * C, d * chi, chi          # backward split shape
    per_bond = (
        4 * N * C * (chi * d) ** 2                # yhat + gradient
        + q * 4 * R * Cc * k                      # power step (M^H M Y)
        + ns_iters * (4 * Cc * k ** 2 + 2 * k ** 3)   # NS polar
        + 2 * R * Cc * k                          # B = M Q (split product)
        + 2 * N * d * chi ** 2                    # env update
    )
    total = 2 * (T - 1) * per_bond                # bonds per sweep
    return total * (4 if cplx else 1)


def _mfu(t_sweep, T, N, chi, d, C, **kw):
    """Arithmetic-utilization estimate: useful FLOPs/sweep / time / peak."""
    if not t_sweep:
        return None
    return round(_sweep_flops(T, N, chi, d, C, **kw) / t_sweep
                 / _PEAK_FLOPS, 5)


def _impute_batch_time(Xtr, ytr, Xte, yte, reps=3, encoding="legendre"):
    """Wall-clock of the batched imputation kernel (problem.py impute_batch)
    at ECG200 scale: B instances of one class, a 20% MAR block, dx=1e-4 —
    the hyperopt ImputationLoss inner loop."""
    import mpstime_tpu as mt

    opts = mt.MPSOptions(nsweeps=3, chi_max=25, d=5, verbosity=-1,
                         log_level=-1, encoding=encoding,
                         dtype="float32" if encoding == "legendre" else None)
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1,
                                     test_encoding=False)
    from mpstime_tpu.imputation.problem import impute_batch

    cls = int(np.unique(yte)[0])
    B = min(35, int(np.sum(yte == cls)))
    rng = np.random.default_rng(0)
    _, win = mt.mar(Xte[0], 0.2, rng=rng)
    instances = np.arange(B)

    ts, targets = impute_batch(imp, cls, instances, win, "median")  # warm
    assert np.isfinite(ts).all()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ts, targets = impute_batch(imp, cls, instances, win, "median")
        times.append(time.perf_counter() - t0)
    mae = float(np.mean(np.abs(ts[:, win] - targets[:, win])))
    return float(np.median(times)), B, mae


def _padded_fit_time(Xtr, ytr, reps=3):
    """Wall-clock of a shape-polymorphic hyperopt-trial fit: chi_max=17,
    d=5 trained at padded (40, 8) caps with the runtime rank cap through
    the Pallas fused kernels — the per-trial training cost inside
    tune(padded_trials=True) after the one-time compile."""
    import mpstime_tpu as mt

    opts = mt.MPSOptions(nsweeps=8, chi_max=17, d=5, verbosity=-1,
                         log_level=-1, dtype="float32", pad_to=(40, 8))
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)              # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        times.append(time.perf_counter() - t0)
    import numpy as _np
    rank_ok = int(_np.max(trained.mps.bond_dims())) <= 17
    return float(np.median(times)), rank_ok


def _fold_eval_time(Xtr, ytr, Xte, yte, n_windows=10, reps=5):
    """Wall-clock of one hyperopt fold evaluation: eval_loss(ImputationLoss)
    over n_windows MAR windows x all test instances of both classes — ONE
    fused impute_windows device call per class.  Reference anchor: ~1.9 s
    per fold loss-eval on CPU (docs/src/hyperparameters.md:66-74), with a
    sequential per-(instance, window) MPS_impute loop
    (hyperopt_utils.jl:201-227)."""
    import mpstime_tpu as mt

    opts = mt.MPSOptions(nsweeps=3, chi_max=25, d=5, verbosity=-1,
                         log_level=-1, dtype="float32")
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    rng = np.random.default_rng(42)
    windows = [mt.mar(Xte[0], p, rng=rng)[1]
               for p in np.linspace(0.05, 0.5, n_windows)]
    loss = mt.eval_loss(mt.ImputationLoss(), trained, Xte, yte,
                        windows=windows)                         # warm
    assert np.isfinite(loss).all()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mt.eval_loss(mt.ImputationLoss(), trained, Xte, yte, windows=windows)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _tune_fold_train_time(reps=3):
    """Train one tuning-demo fold at the reference's documented shape (IPD
    4/5 split: N=54, T=24, chi_max=37, d=8, 10 sweeps) — the reference
    reports ~127-129 s per fold train on CPU
    (docs/src/hyperparameters.md:66-74).  Synthetic IPD-shaped data (real
    IPD is not vendorable offline); full fit_mps wall-clock including
    preprocessing + encoding, fused-sweep path."""
    import mpstime_tpu as mt

    X, y = synth_two_sine(np.random.default_rng(1), 27, 27, T=24)
    opts = mt.MPSOptions(nsweeps=10, chi_max=37, d=8, verbosity=-1,
                         log_level=-1, dtype="float32")
    mt.fit_mps(X, y, opts=opts)                                  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        trained, _, _ = mt.fit_mps(X, y, opts=opts)
        times.append(time.perf_counter() - t0)
    acc = float(np.mean(mt.classify(trained, X) == y))
    return float(np.median(times)), acc


def _batched_fit_time(reps=3, F=8, chi=20, d=4, nsweeps=5):
    """F IPD-shaped fits as ONE vmapped device call (fit_mps_batch, the
    hyperopt fold/trial-axis route) vs the same F fits sequentially through
    fit_mps — the many-small-fits throughput datapoint (reference posture:
    one sequential fit per (trial, fold), tuning.jl:158-176).

    The F=32/chi=10 variant is the regime the vmapped route exists for:
    each tiny fit is pure dispatch latency sequentially, so the model-axis
    batch amortizes ~all of it (r4 VERDICT weak #6)."""
    import mpstime_tpu as mt

    rng = np.random.default_rng(2)
    jobs = [synth_two_sine(rng, 27, 27, T=24) for _ in range(F)]
    opts = mt.MPSOptions(nsweeps=nsweeps, chi_max=chi, d=d, verbosity=-1,
                         log_level=-1, dtype="float32")
    mt.fit_mps_batch(jobs, opts=opts)                            # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        models = mt.fit_mps_batch(jobs, opts=opts)
        times.append(time.perf_counter() - t0)
    t_batch = float(np.median(times))
    acc = float(np.mean([np.mean(mt.classify(m, X) == y)
                         for m, (X, y) in zip(models, jobs)]))
    mt.fit_mps(*jobs[0], opts=opts)                              # warm
    t0 = time.perf_counter()
    for Xf, yf in jobs:
        mt.fit_mps(Xf, yf, opts=opts)
    t_seq = time.perf_counter() - t0
    return t_batch, t_seq, round(t_seq / max(t_batch, 1e-9), 2), acc


# Prepended to every bench child process: honor the CPU-fallback decision.
# JAX_PLATFORMS=cpu as an env var does NOT override the axon site plugin
# (it registers itself at interpreter startup via PYTHONPATH); only
# jax.config.update after import does.
_FORCE_CPU_PRELUDE = r"""
import os as _os
if _os.environ.get("MPSTIME_TPU_FORCE_CPU"):
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
"""


_LIVENESS_CHILD = r"""
import jax
print("PLATFORM_OK", jax.devices()[0].platform)
"""


def _platform_alive(timeout=300):
    """The axon TPU tunnel can go down in a way where jax.devices() BLOCKS
    forever (observed r4: socket-level hang, not an error).  Probe device
    discovery in a subprocess with a deadline so the bench degrades to a
    labeled CPU run instead of hanging the driver."""
    try:
        r = subprocess.run([sys.executable, "-c", _LIVENESS_CHILD],
                           capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0 and "PLATFORM_OK" in r.stdout
    except Exception:                                    # noqa: BLE001
        return False


_MESH_CHILD = r"""
import json, os, time
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
        " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import mpstime_tpu as mt
from mpstime_tpu.encodings import encode_dataset
from mpstime_tpu.models.mps import random_mps
from mpstime_tpu.parallel import (make_mesh, replicate, shard_train_arrays,
                                  sharded_full_sweeps)
from mpstime_tpu.training.sweep import full_sweeps
from mpstime_tpu.utils.preprocessing import transform_data

d_npz = np.load("tests/data/ecg200.npz")
X, y = d_npz["X_train"], d_npz["y_train"]
chi, d = 16, 5
opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, dtype="float32",
                     svd_alg="gram_eigh")
Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
ds = encode_dataset(X, Xs, y, opts)
T, N, C = X.shape[1], X.shape[0], ds.num_classes
mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, np.float32)
phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
y1h = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
w = jnp.full((N,), 1.0 / N, jnp.float32)
pad = (-N) % 8
if pad:
    phis_c = jnp.concatenate([phis_c, jnp.repeat(phis_c[:, :1], pad, 1)], 1)
    y1h = jnp.concatenate([y1h, jnp.repeat(y1h[:1], pad, 0)], 0)
    w = jnp.concatenate([w, jnp.zeros(pad, jnp.float32)], 0)
kw = dict(nsweeps=4, loss="KLD", bbopt="TSGO", update_iters=1,
          rescale=(False, True), svd_alg="gram_eigh")
mesh = make_mesh(8)
sp, sy, sw = shard_train_arrays(mesh, phis_c, y1h, w)
rc, rce = replicate(mesh, mps.cores, mps.center)
eta, cut = jnp.float32(0.01), jnp.float32(1e-10)

def t_of(fn):
    c, ce = fn()
    float(jnp.linalg.norm(ce))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        c, ce = fn()
        float(jnp.linalg.norm(ce))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / kw["nsweeps"], bool(jnp.isfinite(ce).all())

t1, ok1 = t_of(lambda: full_sweeps(mps.cores, mps.center, phis_c, y1h, w,
                                   eta, cut, **kw))
t8, ok8 = t_of(lambda: sharded_full_sweeps(mesh, rc, rce, sp, sy, sw,
                                           eta, cut, **kw))
print(json.dumps({"mesh_check_ok": ok1 and ok8,
                  "mesh_check_cpu1_sweep_s": round(t1, 5),
                  "mesh_check_cpu8_sweep_s": round(t8, 5),
                  "mesh_check_note": "correctness-only (8 VIRTUAL devices "
                  "sharing one host's cores; slower than 1 device by "
                  "construction — not a perf datapoint)"}))
"""


def _mesh_datapoint():
    """Run the 8-virtual-device CPU mesh bench in a subprocess (the CPU
    backend with forced device count must initialize before any other
    backend)."""
    try:
        out = subprocess.run([sys.executable, "-c", _MESH_CHILD],
                             capture_output=True, text=True, timeout=1200)
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception as e:                               # noqa: BLE001
        return {"mesh_check_ok": False, "mesh_check_error": str(e)[:200]}


_CHI320_CHILD = r"""
import json
import numpy as np
import bench
d = np.load("tests/data/ecg200.npz")
t, _, _ = bench._steady_sweep_time(d["X_train"], d["y_train"], chi=320, d=5,
                                   nsweeps_block=4, reps=3,
                                   measure_percall=False)
print(json.dumps({"t": t}))
"""


def _chi320_datapoint():
    """chi=320 rides the split-tail fused route whose ~12-minute cold
    compile can get the axon compile helper SIGKILLed when the remote
    service restarted and lost its executable cache (observed r4) — run it
    in an isolated subprocess so a compile failure costs this one datapoint
    rather than the whole bench."""
    out = None
    try:
        out = subprocess.run(
            [sys.executable, "-c", _FORCE_CPU_PRELUDE + _CHI320_CHILD],
            capture_output=True, text=True, timeout=2400,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        lines = out.stdout.strip().splitlines()
        if not lines:
            # the child died before printing (e.g. the compile helper
            # SIGKILLed it) — surface its stderr tail, not an IndexError
            raise RuntimeError(
                f"child rc={out.returncode}, no stdout; stderr tail: "
                + " | ".join(out.stderr.strip().splitlines()[-3:]))
        return {"ecg200_sweep_time_chi320":
                round(json.loads(lines[-1])["t"], 5)}
    except Exception as e:                               # noqa: BLE001
        msg = str(e)
        if out is not None and "stderr tail" not in msg and out.stderr:
            msg += " | stderr: " + " | ".join(
                out.stderr.strip().splitlines()[-2:])
        return {"ecg200_sweep_time_chi320": None,
                "ecg200_sweep_time_chi320_error": msg[:400]}


_CANARY_CHILD = r"""
import numpy as np
import bench
d = np.load("tests/data/ecg200.npz")
t, _, acc = bench._steady_sweep_time(d["X_train"][:40], d["y_train"][:40],
                                     chi=64, d=5, nsweeps_block=2, reps=1,
                                     measure_percall=False)
assert np.isfinite(t) and acc > 0.0
print("CANARY_OK")
"""


def _pick_route():
    """Probe the fused bond route in a subprocess before committing the
    main process to it: the K12/K12m single-kernel and block kernels are
    the newest Mosaic surface, and a compile rejection there should cost a
    route demotion (block off, then Pallas off), not the whole bench.  The
    canary also pre-warms the persistent compile cache for the real runs.
    Returns the env overrides to apply + a label for the output record."""
    candidates = [
        ({}, "fused+block"),
        ({"MPSTIME_TPU_BOND_BLOCK": "1"}, "fused (block disabled)"),
        ({"MPSTIME_TPU_NO_PALLAS": "1"}, "xla (pallas disabled)"),
    ]
    here = os.path.dirname(os.path.abspath(__file__))
    for env_add, label in candidates:
        env = dict(os.environ, **env_add)
        try:
            r = subprocess.run(
                [sys.executable, "-c", _FORCE_CPU_PRELUDE + _CANARY_CHILD],
                capture_output=True, text=True, timeout=1800,
                cwd=here, env=env)
        except subprocess.TimeoutExpired:
            continue
        if "CANARY_OK" in r.stdout:
            os.environ.update(env_add)
            return label
    return "canary failed on every route (running with defaults)"


def main():
    import jax

    platform_fallback = None
    if not _platform_alive():
        # Device discovery hangs/fails: run the whole bench on CPU so the
        # driver still gets a JSON line.  Label it loudly — CPU numbers are
        # NOT comparable to the TPU datapoints in BENCH_r*.json history.
        os.environ["MPSTIME_TPU_FORCE_CPU"] = "1"
        jax.config.update("jax_platforms", "cpu")
        platform_fallback = ("primary platform unreachable (device "
                             "discovery hung) — CPU fallback; numbers NOT "
                             "comparable to TPU rounds")

    route = _pick_route()
    d_npz = np.load("tests/data/ecg200.npz")
    X, y = d_npz["X_train"], d_npz["y_train"]
    Xte, yte = d_npz["X_test"], d_npz["y_test"]

    record = {}

    def step(fn, *keys, pick=None):
        """Run one workload; on failure record <firstkey>_error and None
        values so a single cold-compile casualty (e.g. the axon service
        restarting mid-round and SIGKILLing a big recompile) degrades to a
        missing datapoint instead of killing the whole bench.  ``pick``
        selects which slots of fn's result tuple map to ``keys``."""
        try:
            vals = fn()
        except Exception as e:                           # noqa: BLE001
            record.update({k: None for k in keys})
            record[keys[0] + "_error"] = str(e)[:160]
            return
        if not isinstance(vals, tuple):
            vals = (vals,)
        if pick is not None:
            vals = tuple(vals[i] for i in pick)
        for k, v in zip(keys, vals):
            record[k] = round(v, 5) if isinstance(v, float) else v

    step(lambda: _steady_sweep_time(X, y, chi=64, d=5),
         "ecg200_sweep_time_chi64", "ecg200_sweep_time_chi64_percall",
         "train_acc_after_8_sweeps_chi64")
    step(lambda: _steady_sweep_time(X, y, chi=32, d=5,
                                    measure_percall=False)[0],
         "ecg200_sweep_time_chi32")
    step(lambda: _steady_sweep_time(X, y, chi=128, d=5,
                                    measure_percall=False),
         "ecg200_sweep_time_chi128", "train_acc_after_8_sweeps_chi128",
         pick=(0, 2))
    # big-chi fused path (raised Mosaic VMEM budget; was the XLA fallback
    # at 0.095 / 0.158 in r2)
    step(lambda: _steady_sweep_time(X, y, chi=192, d=5, nsweeps_block=4,
                                    measure_percall=False)[0],
         "ecg200_sweep_time_chi192")
    step(lambda: _steady_sweep_time(X, y, chi=256, d=5, nsweeps_block=4,
                                    measure_percall=False)[0],
         "ecg200_sweep_time_chi256")
    # complex-encoding path (fourier c64).  chi=64 sits above
    # COMPLEX_RITZ_CHI_GATE, so the shipped auto default here is the
    # Ritz-rotated warm split on the XLA bond path (exact-band accuracy,
    # docs/complex_split_oracle.md section 5) — the headline datapoint
    # measures that default.  The _fused datapoint pins the eigh-free pair
    # kernels (ops/pallas_bond_c.py, warm q=3 — the auto route at/below the
    # gate, a perf knob above it); the K2 datapoint is a perf-knob
    # reference only — under q=3 it costs accuracy (section 6).
    step(lambda: _steady_sweep_time(X, y, chi=64, d=5, measure_percall=False,
                                    encoding="fourier"),
         "fourier_c64_sweep_time_chi64", "fourier_train_acc_after_8_sweeps",
         pick=(0, 2))
    step(lambda: _steady_sweep_time(X, y, chi=64, d=5, measure_percall=False,
                                    encoding="fourier",
                                    svd_alg="randomized_warm"),
         "fourier_c64_sweep_time_chi64_fused",
         "fourier_fused_train_acc_after_8_sweeps", pick=(0, 2))
    step(lambda: _steady_sweep_time(X, y, chi=64, d=5, measure_percall=False,
                                    encoding="fourier", refresh_every=2,
                                    svd_alg="randomized_warm")[0],
         "fourier_c64_sweep_time_chi64_refresh2")

    # long-sequence scaling: T=512 synthetic, ECG-like sample count
    rng = np.random.default_rng(0)
    Xl, yl = synth_two_sine(rng, 50, 50, T=512, t_max=8 * np.pi)
    step(lambda: _steady_sweep_time(Xl, yl, chi=64, d=5, nsweeps_block=4,
                                    measure_percall=False)[0],
         "longT512_sweep_time_chi64")

    # IPD-shaped synthetic anchor workload (T=24, N=67, 2 classes)
    Xi, yi = synth_two_sine(rng, 34, 33, T=24)
    # tiny workload -> most sensitive to remote-service jitter; use more
    # reps (measured swings up to 8x with 3 reps)
    step(lambda: _steady_sweep_time(Xi, yi, chi=25, d=5, reps=9,
                                    measure_percall=False)[0],
         "ipd_shape_sweep_time_chi25")

    step(lambda: _impute_batch_time(X, y, Xte, yte),
         "ecg200_impute_batch_time", "impute_batch_B", "impute_batch_mae")
    step(lambda: _impute_batch_time(X, y, Xte, yte, encoding="fourier")[0],
         "fourier_c64_impute_batch_time")
    step(lambda: _fold_eval_time(X, y, Xte, yte), "ecg200_fold_eval_time")
    step(_tune_fold_train_time, "tune_fold_train_time",
         "tune_fold_train_acc")
    step(lambda: _padded_fit_time(X, y), "padded_trial_fit_time",
         "padded_rank_cap_ok")
    step(_batched_fit_time, "batched_fit8_time", "sequential_fit8_time",
         "batched_fit8_speedup", "batched_fit8_mean_train_acc")
    # the regime the vmapped route targets: many tiny latency-bound fits
    step(lambda: _batched_fit_time(F=32, chi=10, d=3, nsweeps=3),
         "batched_fit32_time", "sequential_fit32_time",
         "batched_fit32_speedup", "batched_fit32_mean_train_acc")
    # chi=320 last + isolated: its split-tail cold compile is the one
    # workload that can take down the compile helper (see _chi320_datapoint)
    record.update(_chi320_datapoint())
    mesh = _mesh_datapoint()

    baseline = 0.80  # s/sweep, Julia reference anchor (module docstring)
    t64 = record.get("ecg200_sweep_time_chi64")
    t_ipd = record.get("ipd_shape_sweep_time_chi25")
    t_fold_eval = record.get("ecg200_fold_eval_time")
    t_fold_train = record.get("tune_fold_train_time")
    out = {
        "metric": "ecg200_sweep_time_chi64",
        "value": t64,
        "unit": "s/sweep",
        "vs_baseline": round(baseline / t64, 2) if t64 else None,
    }
    out.update(record)
    if t_ipd:
        out["ipd_shape_vs_baseline"] = round(baseline / t_ipd, 2)
    if t_fold_eval:
        out["fold_eval_vs_ref_1.9s"] = round(1.9 / t_fold_eval, 1)
    if t_fold_train:
        out["tune_fold_train_vs_ref_128s"] = round(128.0 / t_fold_train, 0)
    # Arithmetic utilization (VERDICT r4 task 9): estimated structural
    # FLOPs/sweep over measured time over bf16 peak.  At chi=64 the real
    # path is latency-bound small-matrix work, so low MFU is expected —
    # the number exists to show whether blocking/donation raise it.
    T_, N_ = X.shape[1], X.shape[0]
    out["mfu_estimate"] = _mfu(t64, T_, N_, 64, 5, 2)
    out["mfu_estimate_chi256"] = _mfu(
        record.get("ecg200_sweep_time_chi256"), T_, N_, 256, 5, 2)
    out["mfu_estimate_fourier_chi64"] = _mfu(
        record.get("fourier_c64_sweep_time_chi64_fused"), T_, N_, 64, 5, 2,
        q=3, cplx=True)
    out["mfu_note"] = ("lower-bound structural-matmul FLOPs / measured "
                       "s/sweep / 197 TFLOP/s bf16 peak (v5e)")
    out["device"] = str(jax.devices()[0])
    out["bond_route"] = route
    if platform_fallback:
        out["platform_fallback"] = platform_fallback
    out["shapes"] = {"T": 96, "N": 100, "chi": 64, "d": 5}
    out.update(mesh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
