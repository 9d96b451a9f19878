"""Measure the ritz route's TPU sweep time and its cost breakdown.

Late r4 gated complex encodings above options.COMPLEX_RITZ_CHI_GATE onto
`svd_alg="randomized_warm_ritz"` (quality: the fused warm q=3 route is out
of the exact band at fourier chi=64 — docs/complex_split_oracle.md
section 5).  The ritz route always takes the XLA bond path and adds a
per-bond complex [k, k] eigh plus (at orth=qr) a per-bond realified
[2 chi d, 2 chi] Householder QR — neither has a measured on-chip number
since r3's 0.68 s/sweep eigh-per-bond datapoint.  Cells (fourier c64
chi=64 ECG200 unless noted):

  ritz_qr        the shipped default above the gate (headline)
  ritz_ns        QR swapped for matmul-only Newton-Schulz (quality probed
                 on CPU by scripts/chi64_probe.py custom ritz_ns)
  warm_q1_qr_xla same XLA sweep structure minus the eigh -> eigh cost
  warm_q1_ns_xla ... and minus the QR too -> QR-vs-NS cost on XLA
  warm_q3_fused  the fused pair-kernel perf knob (reference point)
  ritz_qr@48     gate-boundary chi (the 41..63 band ships ritz)

Each cell runs in its own subprocess (isolated Mosaic/compile failures,
per-cell env). Usage:
  nohup python scripts/ritz_tpu_probe.py > /tmp/ritz_tpu.log 2>&1 &
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

# name -> (chi, svd_alg, orth, q, no_pallas, ritz_exact_sweeps)
# res=-1: eigh every sweep (the pre-track route); res=2: the shipped
# exact->track schedule (2 eigh sweeps then the eigh-free orthogonal-iteration
# tracker); res=0: pure tracking (steady-state bound — all 8 timed
# sweeps tracked).
CELLS = {
    "ritz_qr": (64, "randomized_warm_ritz", "qr", 0, False, -1),
    "ritz_ns": (64, "randomized_warm_ritz", "ns", 0, False, -1),
    "warm_q1_qr_xla": (64, "randomized_warm", "qr", 1, True, -1),
    "warm_q1_ns_xla": (64, "randomized_warm", "ns", 1, True, -1),
    "warm_q3_fused": (64, "randomized_warm", "auto", 0, False, -1),
    "ritz_qr@48": (48, "randomized_warm_ritz", "qr", 0, False, -1),
    "ritz_track": (64, "randomized_warm_ritz", "ns", 0, False, 2),
    "ritz_track_ss": (64, "randomized_warm_ritz", "ns", 0, False, 0),
    "ritz_track_qr": (64, "randomized_warm_ritz", "qr", 0, False, 2),
    "ritz_track_ss_qr": (64, "randomized_warm_ritz", "qr", 0, False, 0),
}


def child(name: str):
    if os.environ.get("MPSTIME_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import MPS, random_mps
    from mpstime_tpu.training.stats import loss_acc_conf
    from mpstime_tpu.training.sweep import full_sweeps
    from mpstime_tpu.utils.preprocessing import transform_data

    chi, alg, orth, q, _, res = CELLS[name]
    smoke = bool(os.environ.get("MPSTIME_PROBE_SMOKE"))
    if smoke:
        chi = 12
    d_npz = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]
    seed = int(os.environ.get("MPSTIME_PROBE_SEED", "1234"))
    opts = mt.MPSOptions(chi_max=chi, d=5, verbosity=-1, encoding="fourier",
                         svd_alg=alg, orth_alg=orth, init_rng=seed,
                         subspace_power_iters=q)
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
              rescale=(False, True), svd_alg=opts.resolved_svd_alg(),
              power_iters=opts.resolved_power_iters(),
              orth=opts.resolved_orth_alg(), ritz_exact_sweeps=res)
    eta = jnp.asarray(opts.eta, rdt)
    cutoff = jnp.asarray(opts.cutoff, rdt)
    nb, reps = (2, 1) if smoke else (8, 5)
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nb, **kw)
    float(jnp.abs(center).max())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nb, **kw)
        float(jnp.abs(center).max())
        times.append(time.perf_counter() - t0)
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc,
                                 ds.y_idx)
    print(json.dumps({"cell": name, "chi": chi, "seed": seed,
                      "alg": kw["svd_alg"], "orth": kw["orth"],
                      "q": kw["power_iters"], "res": res,
                      "no_pallas": bool(os.environ.get(
                          "MPSTIME_TPU_NO_PALLAS")),
                      "s_per_sweep": round(float(np.median(times)) / nb, 5),
                      "train_acc": round(float(acc), 4)}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    names = sys.argv[1:] or list(CELLS)
    for name in names:
        env = dict(os.environ)
        if CELLS[name][4]:
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
