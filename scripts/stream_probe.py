"""On-chip probe for the r5 N-streaming bond-step route.

Production-scale batches (the UCR sets never trip the VMEM gate) used to
fall off the fused kernels entirely; the streaming route keeps them
fused by tiling the batch axis (pallas_bond._bond_step_streamed).
Synthetic legendre-shaped f32 data at ECG dimensions (T=96, d=5,
chi=64), batch sizes straddling the gate:

  n100        control: plain fused route (no streaming engages)
  n20k        N=20000 -> streamed (stream_tile_for proposes ~5k tiles)
  n20k_xla    same shapes on the XLA bond path (what streaming beats)

Quiet machine; run cells sequentially:
  nohup python scripts/stream_probe.py > /tmp/stream_probe.log 2>&1 &
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
    "n100": dict(N=100),
    "n20k": dict(N=20000),
    "n20k_xla": dict(N=20000, no_pallas=True),
}


def child(name: str):
    cell = CELLS[name]
    import jax.numpy as jnp

    from mpstime_tpu.ops import pallas_bond
    from mpstime_tpu.training.sweep import full_sweeps

    N = cell["N"]
    T, chi, d, C = 96, 64, 5, 2
    rng = np.random.default_rng(0)
    f32 = np.float32
    phis = jnp.asarray(rng.uniform(-0.8, 0.8, (T, N, d)).astype(f32))
    cores0 = jnp.asarray(rng.standard_normal((T, chi, d, chi)).astype(f32)
                         * 0.1)
    center0 = jnp.asarray(rng.standard_normal((chi, d, chi, C)).astype(f32)
                          * 0.1)
    y1h = jnp.asarray(np.eye(C, dtype=f32)[rng.integers(0, C, N)])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm",
              power_iters=1, orth="ns")
    tile = pallas_bond.stream_tile_for(C, chi, d, N)
    nb, reps = 4, 3
    cores, center = full_sweeps(cores0, center0, phis, y1h, w,
                                jnp.float32(0.02), jnp.float32(1e-10),
                                nsweeps=nb, **kw)
    float(jnp.abs(center).max())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(cores0, center0, phis, y1h, w,
                                    jnp.float32(0.02), jnp.float32(1e-10),
                                    nsweeps=nb, **kw)
        float(jnp.abs(center).max())
        times.append(time.perf_counter() - t0)
    print(json.dumps({"cell": name, "N": N, "stream_tile": tile,
                      "s_per_sweep": round(float(np.median(times)) / nb, 5),
                      "finite": bool(jnp.isfinite(center).all())}),
          flush=True)


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
