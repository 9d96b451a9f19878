"""On-chip probe for the r5 fused MSE/GD bond-step variants.

Measures, at ECG200 f32 chi=64 (the real hot-path shape), steady-state
s/sweep + train acc after 8 sweeps per cell:

  mse_tsgo       MSE + TSGO, fused (K12/K12m single-bond route — MSE is
                 gated out of the multi-bond blocks)
  mse_tsgo_xla   same on the XLA bond path (what the fusion buys)
  kld_gd         KLD + GD, fused (blocks eligible)
  kld_tsgo       control: the shipped default route

Quiet machine:
  nohup python scripts/mse_fused_probe.py > /tmp/mse_fused.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

CELLS = {
    "mse_tsgo": dict(loss="MSE", bbopt="TSGO", eta=0.4),
    "mse_tsgo_xla": dict(loss="MSE", bbopt="TSGO", eta=0.4, no_pallas=True),
    "kld_gd": dict(loss="KLD", bbopt="GD", eta=0.02),
    "kld_tsgo": dict(loss="KLD", bbopt="TSGO", eta=0.02),
}


def child(name: str):
    cell = CELLS[name]
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import MPS, random_mps
    from mpstime_tpu.training.stats import loss_acc_conf
    from mpstime_tpu.training.sweep import full_sweeps
    from mpstime_tpu.utils.preprocessing import transform_data

    chi, d, nsweeps = 64, 5, 8
    d_npz = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]
    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1,
                         svd_alg="randomized_warm", init_rng=1234)
    dt = opts.resolved_dtype()
    rdt = np.zeros(0, dt).real.dtype
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts, dtype=dt)
    T, N = X.shape[1], X.shape[0]
    mps = random_mps(opts.init_rng, T, d, ds.num_classes, opts.chi_init,
                     chi, dt)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(ds.num_classes)[ds.y_idx], rdt)
    w = jnp.full((N,), 1.0 / N, rdt)
    kw = dict(loss=cell["loss"], bbopt=cell["bbopt"], update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm",
              power_iters=1, orth=opts.resolved_orth_alg())
    eta = jnp.asarray(cell["eta"], rdt)
    cutoff = jnp.asarray(opts.cutoff, rdt)
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nsweeps, **kw)
    float(jnp.abs(center).max())
    times = []
    for _ in range(5):
        cores2, center2 = full_sweeps(mps.cores, mps.center, phis_c,
                                      y_onehot, w, eta, cutoff,
                                      nsweeps=nsweeps, **kw)
        t0 = time.perf_counter()
        cores2, center2 = full_sweeps(mps.cores, mps.center, phis_c,
                                      y_onehot, w, eta, cutoff,
                                      nsweeps=nsweeps, **kw)
        float(jnp.abs(center2).max())
        times.append(time.perf_counter() - t0)
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc,
                                 ds.y_idx)
    print(json.dumps({"cell": name, "loss": cell["loss"],
                      "bbopt": cell["bbopt"],
                      "s_per_sweep": round(float(np.median(times)) / nsweeps,
                                           5),
                      "train_acc": round(float(acc), 4)}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    names = sys.argv[1:] or list(CELLS)
    for name in names:
        env = dict(os.environ)
        if CELLS[name].get("no_pallas"):
            env["MPSTIME_TPU_NO_PALLAS"] = "1"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name],
                capture_output=True, text=True, timeout=3600, env=env)
        except subprocess.TimeoutExpired:
            print(json.dumps({"cell": name, "error": "timeout 3600s"}),
                  flush=True)
            continue
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
        else:
            print(json.dumps({"cell": name,
                              "error": (r.stderr or "no output")[-300:]}),
                  flush=True)


if __name__ == "__main__":
    main()
