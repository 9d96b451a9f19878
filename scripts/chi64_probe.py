"""Probe: close the chi=64 complex-encoding accuracy caveat.

The r4 exact-split oracle (docs/complex_split_oracle.md section 5) left one
open quality caveat: at chi=64 EVERY fast split degrades vs exact SVD on
fourier (warm q3 0.64-0.69 vs exact 0.76-0.82) and the shipped advice is
"run svd_alg='svd' on CPU f64 for final large-chi complex fits".  Two probe
rows hinted at TPU-viable fixes that were never followed up:

  rnd (Ritz, cold oversampled sketch + [k,k] eigh)  chi=64 fourier: 0.84
  warm + Ritz (warm subspace + [k,k] eigh)          chi=64 fourier: 0.80

both single-seed.  This probe pins the chi=64 cell across 3 seeds for the
candidate fixes:

  exact_svd       ground-truth band (seeds beyond the oracle's one)
  randomized      the shipped cold Ritz route (svd_alg="randomized", q=2)
  randomized_q3   same with an odd power count (+- pair hygiene)
  warm_ritz       warm subspace + Rayleigh-Ritz rotation, q=1
  warm_ritz_q3    same at the complex default q=3
  warm_q5         more odd power steps, zero new ops (fused-path viable)

ECG200, f64/c128 CPU, nsweeps=10, fourier d=5 (phase 2: sahand d=6 /
stoudenmire d=2 for the winner).  One JSON line per cell.

Usage: nohup python scripts/chi64_probe.py [phase2] > /tmp/chi64_probe.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEEDS = [1234, 777, 2025]      # 1234 = the oracle runs' init_rng default


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import mpstime_tpu as mt
    from mpstime_tpu.ops import decomp
    from mpstime_tpu.training import sweep as sweep_mod
    from mpstime_tpu.training.stats import loss_acc_conf
    from warm_variant_probe import make_ritz_splits

    dnz = np.load(os.path.join(os.path.dirname(__file__), "..",
                               "tests", "data", "ecg200.npz"))
    X, y = dnz["X_train"], dnz["y_train"]
    Xte, yte = dnz["X_test"], dnz["y_test"]

    ritz_l, ritz_r = make_ritz_splits()
    base_l, base_r = decomp.warm_split_left, decomp.warm_split_right

    def pin(fn, q, orth="qr"):
        # force the variant's q + orth against the call-site kwargs the
        # sweep now passes.  orth="qr" = the oracle's historical CPU route
        # (per-step column normalization, ONE end QR); orth="ns" = the
        # shipped TPU route (true subspace iteration: NS polar after EVERY
        # power step — converges to an ordered eigenbasis, which the qr
        # chain does not; the chi=64 section-5 caveat numbers were all
        # measured on the qr chain).
        forced = orth

        def wrapped(*a, q_caller=None, orth=None, **kw):
            kw.pop("q", None)
            return fn(*a, q=q, orth=forced, **kw)
        return wrapped

    def pin_rnd(fn, q):
        def wrapped(*a, q_caller=None, **kw):
            kw.pop("q", None)
            return fn(*a, q=q, **kw)
        return wrapped

    # variant -> (svd_alg, warm-split patch or None, randomized-q patch or None)
    variants = {
        "exact_svd": ("svd", None, None),
        "randomized": ("randomized", None, None),
        "randomized_q3": ("randomized", None, 3),
        "warm_ritz": ("randomized_warm", (pin(ritz_l, 1), pin(ritz_r, 1)),
                      None),
        "warm_ritz_q3": ("randomized_warm", (pin(ritz_l, 3), pin(ritz_r, 3)),
                         None),
        "warm_q3": ("randomized_warm", (pin(base_l, 3), pin(base_r, 3)),
                    None),
        "warm_q5": ("randomized_warm", (pin(base_l, 5), pin(base_r, 5)),
                    None),
        "warm_q3_ns": ("randomized_warm",
                       (pin(base_l, 3, "ns"), pin(base_r, 3, "ns")), None),
        "warm_q5_ns": ("randomized_warm",
                       (pin(base_l, 5, "ns"), pin(base_r, 5, "ns")), None),
        # the SHIPPED ritz route via its public knobs (no patching), and an
        # NS-orth twin: if quality holds, the per-bond [2 chi d, 2 chi]
        # realified QR in the ritz refresh can be swapped for matmul-only
        # Newton-Schulz on TPU (the [k, k] eigh stays — the Ritz values are
        # basis-independent given an orthonormal span, so NS's ~1e-6
        # non-orthonormality perturbs them only at that order)
        "ritz": ("randomized_warm_ritz", None, None),
        "ritz_ns": ("randomized_warm_ritz", None, None),
        # exact->track schedule (late r4): eigh sweeps 0-1 then the
        # eigh-free orthogonal-iteration tracker (ops/decomp._ritz_rot_track) — the
        # shipped accelerator config above the chi gate; _qr twin isolates
        # the orth choice; _ss = tracking from sweep 0 (no exact warmup,
        # robustness bound)
        "ritz_track": ("randomized_warm_ritz", None, None),
        "ritz_track_qr": ("randomized_warm_ritz", None, None),
        "ritz_track_ss": ("randomized_warm_ritz", None, None),
    }
    variant_orth = {"ritz_ns": "ns", "ritz_track": "ns",
                    "ritz_track_ss": "ns", "ritz_track_qr": "qr"}
    # ritz_exact_sweeps per variant; plain "ritz"/"ritz_ns" stay pinned to
    # the all-exact legacy route (-1) they were measured on
    variant_res = {"ritz_track": 2, "ritz_track_qr": 2, "ritz_track_ss": 0}

    mode = sys.argv[1] if len(sys.argv) > 1 else "phase1"
    chi_override = None
    if mode == "custom":
        # fourier chi=64 cells for the variants named on argv
        cells = [("fourier", v, s) for v in sys.argv[2:] for s in SEEDS]
    elif mode == "phase2":
        # winner confirmation on the other two complex encodings
        cells = [(enc, v, s)
                 for enc in ["sahand", "stoudenmire"]
                 for v in (sys.argv[2:] or ["warm_ritz"])
                 for s in SEEDS]
    elif mode == "phase3":
        # gate-threshold boundary: shipped warm q3 vs the ritz winner at
        # chi=48 (q3 beats exact at chi<=40, degrades at 64 — where between?)
        chi_override = 48
        cells = [("fourier", v, s)
                 for v in (sys.argv[2:] or ["warm_q3_ns", "warm_ritz"])
                 for s in SEEDS]
    else:
        # priority order: the shipped-TPU-route hypothesis first (if
        # warm_q3_ns is in-band, the section-5 caveat is a qr-chain
        # artifact and no new code is needed), then the Ritz candidates,
        # then band/controls
        prio = ["warm_q3_ns", "randomized", "warm_ritz", "warm_q5_ns",
                "warm_ritz_q3", "randomized_q3", "warm_q5"]
        cells = [("fourier", v, s) for v in prio for s in SEEDS]
        cells[3:3] = [("fourier", "exact_svd", s) for s in SEEDS[1:]]

    chi, nsweeps = chi_override or 64, 10
    if os.environ.get("MPSTIME_PROBE_SMOKE"):
        chi, nsweeps = 8, 2
        cells = [("fourier", v, SEEDS[0]) for v in variants]

    enc_d = {"fourier": 5, "sahand": 6, "stoudenmire": 2}
    orig = (sweep_mod.warm_split_left, sweep_mod.warm_split_right)
    orig_rnd = (decomp.randomized_split_left, decomp.randomized_split_right)
    try:
        for enc, name, seed in cells:
            alg, warm_patch, rnd_q = variants[name]
            sweep_mod.warm_split_left, sweep_mod.warm_split_right = \
                warm_patch if warm_patch else orig
            if rnd_q is not None:
                decomp.randomized_split_left = pin_rnd(orig_rnd[0], rnd_q)
                decomp.randomized_split_right = pin_rnd(orig_rnd[1], rnd_q)
            else:
                (decomp.randomized_split_left,
                 decomp.randomized_split_right) = orig_rnd
            jax.clear_caches()
            opts = mt.MPSOptions(encoding=enc, chi_max=chi, d=enc_d[enc],
                                 nsweeps=nsweeps, svd_alg=alg, init_rng=seed,
                                 orth_alg=variant_orth.get(name, "auto"),
                                 ritz_exact_sweeps=variant_res.get(name, -1),
                                 verbosity=-1)
            t0 = time.perf_counter()
            trained, info, test_ds = mt.fit_mps(X, y, Xte, yte, opts=opts)
            dt = time.perf_counter() - t0
            _, _, tr_acc, _ = loss_acc_conf(trained.mps,
                                            trained.train_data.X_enc,
                                            trained.train_data.y_idx)
            _, _, te_acc, _ = loss_acc_conf(trained.mps, test_ds.X_enc,
                                            test_ds.y_idx)
            print(json.dumps({"encoding": enc, "variant": name,
                              "seed": seed, "chi": chi,
                              "train_acc": round(float(tr_acc), 4),
                              "test_acc": round(float(te_acc), 4),
                              "seconds": round(dt, 1)}), flush=True)
    finally:
        sweep_mod.warm_split_left, sweep_mod.warm_split_right = orig
        (decomp.randomized_split_left,
         decomp.randomized_split_right) = orig_rnd


if __name__ == "__main__":
    main()
