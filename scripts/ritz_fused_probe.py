"""On-chip probe for the r5 FUSED tracked-ritz route (K12cr).

Measures, at the route's target cell (ECG200 fourier c64 chi=64 unless
noted), per subprocess cell:

  ss         res=0 pure tracked, everything fused — the steady-state
             sweep-time bound (VERDICT r4 task 2 target: <= 0.03 s/sweep)
  res2       the shipped schedule (2 exact-eigh XLA sweeps + fused
             tracked) — amortized cost over an 8-sweep block
             (task 3 target: <= 0.08 s/sweep)
  jwarm      ritz_rot_exact="jacobi": 24-round jacobi cold start, NO eigh
             anywhere — every sweep fused (oracle round 2 gating)
  xla_jacobi res=0 tracked on the XLA bond path (NO_PALLAS) — what the
             fusion buys
  acc10*     10-sweep runs at the shipped schedule, seeds 1234/777 — the
             f32 quality check (task 2 target: train acc >= 0.90)
  jwarm10*   same for the all-fused jacobi_warm schedule
  chi96_ss   fused tracked at the largest chi inside the K12 gate
  chi128_try gate OVERRIDE at chi=128 (est 27 MB > the 18 MB monolith
             ceiling) — does the K12cr compile survive there?

Run on a QUIET machine (the local compile helper is SIGKILLed under
concurrent CPU load):
  nohup python scripts/ritz_fused_probe.py > /tmp/ritz_fused.log 2>&1 &
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

# name -> dict(chi, res, exact, track, nsweeps, no_pallas, seed,
#              gate_override)
CELLS = {
    "ss": dict(res=0),
    "res2": dict(res=2),
    "jwarm": dict(res=2, exact="jacobi_warm"),
    "xla_jacobi": dict(res=0, no_pallas=True),
    "acc10_1234": dict(res=2, nsweeps=10, seed=1234),
    "acc10_777": dict(res=2, nsweeps=10, seed=777),
    "jwarm10_1234": dict(res=2, exact="jacobi_warm", nsweeps=10, seed=1234),
    "jwarm10_777": dict(res=2, exact="jacobi_warm", nsweeps=10, seed=777),
    "chi96_ss": dict(chi=96, res=0),
    "chi128_try": dict(chi=128, res=0, gate_override=True),
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

    chi = cell.get("chi", 64)
    res = cell["res"]
    exact = cell.get("exact", "eigh")
    seed = cell.get("seed", 1234)
    nsweeps = cell.get("nsweeps", 8)
    if cell.get("gate_override"):
        from mpstime_tpu.ops import pallas_bond
        pallas_bond.SPLIT_TAIL_FOOTPRINT = 30 * 2 ** 20

    d_npz = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]
    opts = mt.MPSOptions(chi_max=chi, d=5, verbosity=-1, encoding="fourier",
                         svd_alg="randomized_warm_ritz", init_rng=seed)
    dt = opts.resolved_dtype()
    rdt = np.zeros(0, dt).real.dtype
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts, dtype=dt)
    T, N = X.shape[1], X.shape[0]
    mps = random_mps(opts.init_rng, T, 5, ds.num_classes, opts.chi_init,
                     chi, dt)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(ds.num_classes)[ds.y_idx], rdt)
    w = jnp.full((N,), 1.0 / N, rdt)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm_ritz",
              power_iters=opts.resolved_power_iters(),
              orth=opts.resolved_orth_alg(), ritz_exact_sweeps=res,
              ritz_exact_rot=exact, ritz_track_rot="jacobi")
    eta = jnp.asarray(opts.eta, rdt)
    cutoff = jnp.asarray(opts.cutoff, rdt)
    reps = 3 if nsweeps >= 10 else 5
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nsweeps, **kw)
    float(jnp.abs(center).max())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nsweeps, **kw)
        float(jnp.abs(center).max())
        times.append(time.perf_counter() - t0)
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc,
                                 ds.y_idx)
    print(json.dumps({"cell": name, "chi": chi, "seed": seed, "res": res,
                      "exact": exact, "nsweeps": nsweeps,
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
