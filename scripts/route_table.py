"""Print the bond-step route + block size each benchmark shape resolves to
(host-side, no device needed) — run after touching the footprint gates in
ops/pallas_bond.py or sweep._auto_block to see exactly which configs move.

Usage: python scripts/route_table.py
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mpstime_tpu.ops.pallas_bond import (MAX_FOOTPRINT,  # noqa: E402
                                         SPLIT_MAX_FOOTPRINT,
                                         SPLIT_TAIL_FOOTPRINT,
                                         k12_footprint, kernel_footprint)
from mpstime_tpu.training.sweep import _auto_block  # noqa: E402

MB = 2 ** 20

CONFIGS = [
    # (label, C, chi, d, N, complex?, T)
    ("ECG chi=32", 2, 32, 5, 100, False, 96),
    ("ECG chi=64", 2, 64, 5, 100, False, 96),
    ("ECG chi=128", 2, 128, 5, 100, False, 96),
    ("ECG chi=192", 2, 192, 5, 100, False, 96),
    ("ECG chi=256", 2, 256, 5, 100, False, 96),
    ("ECG chi=320", 2, 320, 5, 100, False, 96),
    ("ECG chi=384", 2, 384, 5, 100, False, 96),
    ("fourier c64 chi=64", 2, 64, 5, 100, True, 96),
    ("fourier c64 chi=128", 2, 128, 5, 100, True, 96),
    ("fourier c64 chi=192", 2, 192, 5, 100, True, 96),
    ("IPD chi=25 pad40", 2, 40, 8, 56, False, 24),
    ("T=512 chi=64", 2, 64, 5, 100, False, 512),
    ("tunefold chi=37 d=8", 2, 37, 8, 56, False, 24),
]


def main():
    print(f"{'config':28} {'kf':>6} {'k12':>6} {'route':24} {'BB':>3}")
    for label, C, chi, d, N, cplx, T in CONFIGS:
        f = 2 if cplx else 1
        kf = f * kernel_footprint(C, chi, d, N)
        k12 = f * k12_footprint(C, chi, d, N)
        if kf > (MAX_FOOTPRINT if cplx else SPLIT_MAX_FOOTPRINT):
            route = "XLA fallback"
        elif k12 <= SPLIT_TAIL_FOOTPRINT:
            route = "K12 single-kernel"
        elif kf <= SPLIT_TAIL_FOOTPRINT:
            route = "K1+K2 two-kernel"
        else:
            route = ("split-tail c" if cplx
                     else "split-tail (qr demote)")
        BB = (_auto_block(C, chi, d, N, T, factor=f, cap=4 if cplx else 8)
              if route == "K12 single-kernel" else 1)
        print(f"{label:28} {kf/MB:6.1f} {k12/MB:6.1f} {route:24} {BB:>3}")


if __name__ == "__main__":
    main()
