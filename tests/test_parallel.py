"""Data-parallel (multi-device mesh) tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpstime_tpu.models.mps import random_mps
from mpstime_tpu.parallel import make_mesh, replicate, shard_train_arrays
from mpstime_tpu.training.sweep import full_sweep


@pytest.fixture(scope="module")
def tiny_problem():
    T, chi, d, C, N = 8, 6, 3, 2, 32
    mps = random_mps(0, T, d, C, 4, chi, np.float64)
    rng = np.random.default_rng(0)
    phis_c = jnp.asarray(rng.uniform(-0.9, 0.9, (T, N, d)))
    y_idx = rng.integers(0, C, N)
    y_idx.sort()
    y_onehot = jnp.asarray(np.eye(C)[y_idx])
    w = jnp.full((N,), 1.0 / N)
    return mps, phis_c, y_onehot, w


KW = dict(loss="KLD", bbopt="TSGO", update_iters=1, rescale=(False, True),
          svd_alg="gram_eigh")


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_sweep_matches_single_device(tiny_problem):
    mps, phis_c, y_onehot, w = tiny_problem
    # single-device reference
    c1, ce1 = full_sweep(mps.cores, mps.center, phis_c, y_onehot, w,
                         0.01, 1e-10, **KW)

    mesh = make_mesh(8)
    sp, sy, sw = shard_train_arrays(mesh, phis_c, y_onehot, w)
    rc, rce = replicate(mesh, mps.cores, mps.center)
    c2, ce2 = full_sweep(rc, rce, sp, sy, sw, 0.01, 1e-10, **KW)

    # the sharded-N computation is mathematically identical; FP reduction
    # order differs, so compare with a tolerance
    np.testing.assert_allclose(np.asarray(ce1), np.asarray(ce2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-8)


def test_sharded_sweeps_match_single_device_xla(tiny_problem):
    """shard_map path (explicit per-bond psum), XLA bond branch."""
    import jax.numpy as jnp
    from mpstime_tpu.parallel import sharded_full_sweeps
    from mpstime_tpu.training.sweep import full_sweeps

    mps, phis_c, y_onehot, w = tiny_problem
    kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="gram_eigh")
    c1, ce1 = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                          0.05, 1e-10, **kw)
    mesh = make_mesh(8)
    sp, sy, sw = shard_train_arrays(mesh, phis_c, y_onehot, w)
    rc, rce = replicate(mesh, mps.cores, mps.center)
    c2, ce2 = sharded_full_sweeps(mesh, rc, rce, sp, sy, sw, 0.05, 1e-10,
                                  **kw)
    np.testing.assert_allclose(np.asarray(ce1), np.asarray(ce2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-10)


def test_sharded_sweeps_complex_matches_single_device(tiny_problem):
    """Complex (c128) training under the dp mesh: the complex path takes
    the XLA bond branch under shard_map (the pair kernels are single-device
    — sweep.py gates on axis_name) and must match the single-device run."""
    import jax.numpy as jnp
    from mpstime_tpu.parallel import sharded_full_sweeps
    from mpstime_tpu.training.sweep import full_sweeps

    mps, phis_c, y_onehot, w = tiny_problem
    c128 = np.complex128
    cores = mps.cores.astype(c128)
    center = mps.center.astype(c128)
    rng = np.random.default_rng(3)
    phis_cx = phis_c.astype(c128) * jnp.exp(
        1j * jnp.asarray(rng.uniform(-1, 1, phis_c.shape)))
    kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm")
    c1, ce1 = full_sweeps(cores, center, phis_cx, y_onehot, w, 0.05, 1e-10,
                          **kw)
    mesh = make_mesh(8)
    sp, sy, sw = shard_train_arrays(mesh, phis_cx, y_onehot, w)
    rc, rce = replicate(mesh, cores, center)
    c2, ce2 = sharded_full_sweeps(mesh, rc, rce, sp, sy, sw, 0.05, 1e-10,
                                  **kw)
    assert np.asarray(ce2).dtype == c128
    np.testing.assert_allclose(np.asarray(ce1), np.asarray(ce2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-8)


def test_sharded_sweeps_complex_ritz_loss_band(tiny_problem):
    """The Ritz route (the auto default above options.COMPLEX_RITZ_CHI_GATE)
    under the dp mesh.  Bitwise sharded-vs-single parity is impossible by
    construction here: the per-bond [k, k] eigh amplifies the psum's
    reduction-order epsilon into O(1) basis rotations inside (near-)
    degenerate Ritz clusters, after which the two trajectories diverge
    benignly (measured max|diff| ~1.9 on this problem — the same class as
    the blocked complex kernels, see test_training's K12mc notes).  Assert
    trajectory-independent health instead: finite outputs, dtype, and the
    final training loss inside a tight band of the single-device run."""
    import jax.numpy as jnp
    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.parallel import sharded_full_sweeps
    from mpstime_tpu.training.stats import loss_acc_conf
    from mpstime_tpu.training.sweep import full_sweeps

    mps, phis_c, y_onehot, w = tiny_problem
    c128 = np.complex128
    cores = mps.cores.astype(c128)
    center = mps.center.astype(c128)
    rng = np.random.default_rng(3)
    phis_cx = phis_c.astype(c128) * jnp.exp(
        1j * jnp.asarray(rng.uniform(-1, 1, phis_c.shape)))
    kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm_ritz")
    c1, ce1 = full_sweeps(cores, center, phis_cx, y_onehot, w, 0.05, 1e-10,
                          **kw)
    mesh = make_mesh(8)
    sp, sy, sw = shard_train_arrays(mesh, phis_cx, y_onehot, w)
    rc, rce = replicate(mesh, cores, center)
    c2, ce2 = sharded_full_sweeps(mesh, rc, rce, sp, sy, sw, 0.05, 1e-10,
                                  **kw)
    assert np.asarray(ce2).dtype == c128
    assert np.all(np.isfinite(np.asarray(c2).view(np.float64)))
    X_enc = jnp.conj(phis_cx).swapaxes(0, 1)
    y_idx = jnp.argmax(y_onehot, axis=1)
    T = cores.shape[0]
    l1, *_ = loss_acc_conf(MPS(c1, ce1, T - 1), X_enc, y_idx)
    l2, *_ = loss_acc_conf(MPS(c2, ce2, T - 1), X_enc, y_idx)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert abs(float(l1) - float(l2)) <= 0.05 * abs(float(l1)), (l1, l2)


def test_sharded_sweeps_production_config_pallas(tiny_problem):
    """The PRODUCTION accelerator config (svd_alg='randomized_warm' + the
    fused Pallas bond kernels, interpreter mode on CPU) under the dp mesh:
    the dp-split kernels (local-grad psum + replicated update) must match
    the single-device fused kernels."""
    import jax.numpy as jnp
    from mpstime_tpu.ops import pallas_bond
    from mpstime_tpu.parallel import sharded_full_sweeps
    from mpstime_tpu.training.sweep import full_sweeps

    mps, phis_c, y_onehot, w = tiny_problem
    f32 = np.float32
    cores = mps.cores.astype(f32)
    center = mps.center.astype(f32)
    phis_c, y_onehot, w = (phis_c.astype(f32), y_onehot.astype(f32),
                           w.astype(f32))
    # nsweeps=2: the dp and fused paths are mathematically identical (the
    # 1-device shard_map run is bit-exact) but psum reduction order differs
    # from the single-device sum; by sweep 3+ that f32 noise can flip a
    # truncation-edge rank decision and the models legitimately diverge
    # (functional equivalence over longer training is asserted end-to-end in
    # test_fit_mps_mesh_production_config)
    kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm")
    pallas_bond.set_interpret(True)
    try:
        jax.clear_caches()
        c1, ce1 = full_sweeps(cores, center, phis_c, y_onehot, w,
                              jnp.float32(0.05), jnp.float32(1e-10), **kw)
        mesh = make_mesh(8)
        sp, sy, sw = shard_train_arrays(mesh, phis_c, y_onehot, w)
        rc, rce = replicate(mesh, cores, center)
        c2, ce2 = sharded_full_sweeps(mesh, rc, rce, sp, sy, sw,
                                      jnp.float32(0.05), jnp.float32(1e-10),
                                      **kw)
    finally:
        pallas_bond.set_interpret(False)
        jax.clear_caches()
    assert np.isfinite(np.asarray(ce2)).all()

    # f32 reduction-order noise can flip a direction sitting exactly at the
    # relative-cutoff edge (kept as ~1e-9 garbage vs truncated to exact 0);
    # zero sub-threshold entries before comparing
    def squash(a):
        a = np.asarray(a).copy()
        a[np.abs(a) < 1e-6] = 0.0
        return a

    np.testing.assert_allclose(squash(ce1), squash(ce2),
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(squash(c1), squash(c2),
                               rtol=1e-2, atol=2e-3)


@pytest.mark.parametrize("forward", [False, True])
@pytest.mark.parametrize("n_dev", [1, 8])
def test_single_bond_dp_matches_fused(tiny_problem, forward, n_dev):
    """ONE bond update, tight contract: the dp-split kernels (per-shard
    local gradient + psum + replicated update/split) must reproduce the
    single-device fused kernel.  On a 1-device mesh the psum is an identity
    so the split path performs the *same arithmetic* as the fused kernel —
    compared at f32 roundoff (1e-7).  On 8 devices the psum's reduction
    order differs from the single-device batch sum; that last-ulp gradient
    noise is amplified through the power-step QR, bounding agreement at
    ~1e-4 — still per-bond-tight, unlike the whole-sweep comparison
    (test_sharded_sweeps_production_config_pallas) where truncation-edge
    rank flips force order-1e-2 tolerances."""
    from jax.sharding import PartitionSpec as P
    from mpstime_tpu.ops import pallas_bond
    from mpstime_tpu.ops.decomp import warm_sketch_init

    mps, phis_c, y_onehot, w = tiny_problem
    f32 = np.float32
    T, chi, d, _ = mps.cores.shape
    C = mps.center.shape[3]
    N = phis_c.shape[1]
    rng = np.random.default_rng(7)

    # synthetic but normalized per-sample environments for one mid-chain bond
    def unit_rows(n, m):
        a = rng.standard_normal((n, m)).astype(f32)
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    A = np.asarray(mps.cores[3], f32)
    center_c = np.asarray(jnp.moveaxis(mps.center, 3, 0), f32)  # [C,chi,d,chi]
    le, re = unit_rows(N, chi), unit_rows(N, chi)
    env_ls = np.zeros((N,), f32)
    phil = np.asarray(phis_c[3], f32)
    phir = np.asarray(phis_c[4], f32)
    y1h = np.asarray(y_onehot, f32)
    wgt = np.asarray(w, f32)
    nq = chi * d
    V0 = np.asarray(warm_sketch_init(nq, chi, f32))
    eta, cutoff = jnp.float32(0.05), jnp.float32(1e-10)

    pallas_bond.set_interpret(True)
    try:
        jax.clear_caches()
        ref = pallas_bond.bond_step(A, center_c, le, re, env_ls, phil, phir,
                                    y1h, wgt, V0, eta, cutoff,
                                    forward=forward)
        mesh = make_mesh(n_dev)

        def dp_body(A, center_c, le, re, env_ls, phil, phir, y1h, wgt, V0):
            return pallas_bond.bond_step(A, center_c, le, re, env_ls, phil,
                                         phir, y1h, wgt, V0, eta, cutoff,
                                         forward=forward, axis_name="dp")

        batch = P("dp")
        rep = P()
        fn = jax.jit(jax.shard_map(
            dp_body, mesh=mesh,
            in_specs=(rep, rep, batch, batch, batch, batch, batch, batch,
                      batch, rep),
            out_specs=(rep, rep, batch, batch, rep), check_vma=False))
        got = fn(A, center_c, le, re, env_ls, phil, phir, y1h, wgt, V0)
    finally:
        pallas_bond.set_interpret(False)
        jax.clear_caches()

    atol = 1e-7 if n_dev == 1 else 1e-4
    names = ("center", "core", "env", "env_ls", "Q")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=atol,
                                   err_msg=f"single-bond dp mismatch: {name}")


@pytest.mark.parametrize("forward", [False, True])
@pytest.mark.parametrize("n_dev", [1, 8])
def test_single_bond_dp_matches_fused_complex(tiny_problem, forward, n_dev):
    """Complex twin of the single-bond dp contract: bond_step_c with
    axis_name (local gradient pair + one psum of (re, im) + replicated
    update/split) must reproduce the fused single-device pair kernel —
    1e-7 on a 1-device mesh (same arithmetic), ~1e-4 on 8 (psum
    reduction-order noise through the pair-QR power step)."""
    from jax.sharding import PartitionSpec as P
    from mpstime_tpu.ops import pallas_bond, pallas_bond_c
    from mpstime_tpu.ops.decomp import warm_sketch_init

    mps, phis_c, y_onehot, w = tiny_problem
    f32 = np.float32
    T, chi, d, _ = mps.cores.shape
    C = mps.center.shape[3]
    N = phis_c.shape[1]
    rng = np.random.default_rng(7)

    def pair(x):
        x = np.asarray(x)
        return (x.real.astype(f32), x.imag.astype(f32))

    def unit_rows_c(n, m):
        a = rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m))
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    crand = rng.standard_normal((C, chi, d, chi)) * 0.3
    A = pair(np.asarray(mps.cores[3]) * np.exp(1j * 0.3))
    center_c = pair(np.asarray(jnp.moveaxis(mps.center, 3, 0)) + 1j * crand)
    le, re = pair(unit_rows_c(N, chi)), pair(unit_rows_c(N, chi))
    env_ls = np.zeros((N,), f32)
    theta_l = rng.uniform(-np.pi, np.pi, (N, d))
    theta_r = rng.uniform(-np.pi, np.pi, (N, d))
    phil = pair(np.exp(-1j * theta_l) / np.sqrt(d))
    phir = pair(np.exp(-1j * theta_r) / np.sqrt(d))
    y1h = np.asarray(y_onehot, f32)
    wgt = np.asarray(w, f32)
    V0 = pair(np.asarray(warm_sketch_init(chi * d, chi, np.complex64)))
    eta, cutoff = jnp.float32(0.05), jnp.float32(1e-10)

    pallas_bond.set_interpret(True)
    try:
        jax.clear_caches()
        ref = pallas_bond_c.bond_step_c(A, center_c, le, re, env_ls, phil,
                                        phir, y1h, wgt, V0, eta, cutoff,
                                        forward=forward)
        mesh = make_mesh(n_dev)

        def dp_body(A, center_c, le, re, env_ls, phil, phir, y1h, wgt, V0):
            return pallas_bond_c.bond_step_c(
                A, center_c, le, re, env_ls, phil, phir, y1h, wgt, V0,
                eta, cutoff, forward=forward, axis_name="dp")

        b, r = P("dp"), P()
        bp, rp = (b, b), (r, r)      # pair-typed operands share one spec
        fn = jax.jit(jax.shard_map(
            dp_body, mesh=mesh,
            in_specs=(rp, rp, bp, bp, b, bp, bp, b, b, rp),
            out_specs=(rp, rp, bp, b, rp), check_vma=False))
        got = fn(A, center_c, le, re, env_ls, phil, phir, y1h, wgt, V0)
    finally:
        pallas_bond.set_interpret(False)
        jax.clear_caches()

    atol = 1e-7 if n_dev == 1 else 1e-4
    names = ("center", "core", "env", "env_ls", "Q")
    for name, rv, gv in zip(names, ref, got):
        for part, rr, gg in zip(("re", "im"),
                                rv if isinstance(rv, tuple) else (rv,),
                                gv if isinstance(gv, tuple) else (gv,)):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(rr), atol=atol,
                err_msg=f"complex single-bond dp mismatch: {name}.{part}")


def test_sharded_sweeps_complex_pallas_dp(tiny_problem):
    """Whole-sweep complex c64 production config under the dp mesh: the
    pair kernels' dp split (now the complex mesh path in
    training/sweep.py) vs the single-device fused pair kernels."""
    from mpstime_tpu.ops import pallas_bond
    from mpstime_tpu.parallel import sharded_full_sweeps
    from mpstime_tpu.training.sweep import full_sweeps

    mps, phis_c, y_onehot, w = tiny_problem
    rng = np.random.default_rng(3)
    T, chi, d, _ = mps.cores.shape
    N = phis_c.shape[1]
    c64, f32 = np.complex64, np.float32
    cores = np.asarray(mps.cores).astype(c64)
    center = np.asarray(mps.center).astype(c64)
    theta = rng.uniform(-np.pi, np.pi, (T, N, d))
    phis_cx = jnp.asarray((np.exp(-1j * theta) / np.sqrt(d)).astype(c64))
    y1h = np.asarray(y_onehot, f32)
    wgt = np.asarray(w, f32)
    kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm")
    pallas_bond.set_interpret(True)
    try:
        jax.clear_caches()
        c1, ce1 = full_sweeps(cores, center, phis_cx, y1h, wgt,
                              jnp.float32(0.05), jnp.float32(1e-10), **kw)
        mesh = make_mesh(8)
        sp, sy, sw = shard_train_arrays(mesh, phis_cx, y1h, wgt)
        rc, rce = replicate(mesh, cores, center)
        c2, ce2 = sharded_full_sweeps(mesh, rc, rce, sp, sy, sw,
                                      jnp.float32(0.05), jnp.float32(1e-10),
                                      **kw)
    finally:
        pallas_bond.set_interpret(False)
        jax.clear_caches()
    assert np.isfinite(np.abs(np.asarray(ce2))).all()

    def squash(a):
        a = np.asarray(a).copy()
        a[np.abs(a) < 1e-6] = 0.0
        return a

    np.testing.assert_allclose(squash(ce1), squash(ce2), rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(squash(c1), squash(c2), rtol=1e-2, atol=2e-3)


def test_fit_mps_mesh_production_config(ecg200):
    """End-to-end fit_mps(mesh=...) with the production accelerator config
    (randomized_warm; Pallas interpreted on CPU) — trains and classifies."""
    import mpstime_tpu as mt
    from mpstime_tpu.ops import pallas_bond

    Xtr, ytr, *_ = ecg200
    Xtr, ytr = Xtr[:40], ytr[:40]
    opts = mt.MPSOptions(nsweeps=3, chi_max=12, d=3, verbosity=-1,
                         log_level=-1, dtype="float32",
                         svd_alg="randomized_warm")
    pallas_bond.set_interpret(True)
    try:
        jax.clear_caches()
        mesh = make_mesh(8)
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts, mesh=mesh)
    finally:
        pallas_bond.set_interpret(False)
        jax.clear_caches()
    acc = np.mean(mt.classify(trained, Xtr) == ytr)
    assert acc >= 0.9


def test_fit_mps_mesh_with_pad_samples_to(ecg200):
    """mesh + pad_samples_to compose: the mesh shard pad must be computed
    from the ALREADY-padded sample-axis length, not the raw N (regression:
    N=50 padded to 54 then +(-50)%8=6 gave 60 — not divisible by 8)."""
    import mpstime_tpu as mt

    Xtr, ytr, *_ = ecg200
    Xtr, ytr = Xtr[:50], ytr[:50]
    opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=3, verbosity=-1,
                         log_level=-1, dtype="float32", svd_alg="gram_eigh")
    mesh = make_mesh(8)
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts, mesh=mesh,
                               pad_samples_to=54)
    acc = np.mean(mt.classify(trained, Xtr) == ytr)
    assert acc >= 0.8


def test_sharded_sweep_collective_count(tiny_problem):
    """The DP contract: exactly ONE all-reduce (of the [chi,d,d,chi,C] bond
    gradient) per bond update.  Each half-sweep compiles to one scan whose
    body contains the single psum, so the compiled module contains exactly
    two all-reduce instructions regardless of T or nsweeps."""
    import re
    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from mpstime_tpu.parallel.mesh import mesh_platform
    from mpstime_tpu.training.sweep import _full_sweeps_impl

    mps, phis_c, y_onehot, w = tiny_problem
    mesh = make_mesh(8)
    sp, sy, sw = shard_train_arrays(mesh, phis_c, y_onehot, w)
    rc, rce = replicate(mesh, mps.cores, mps.center)
    body = partial(_full_sweeps_impl, nsweeps=4, loss="KLD", bbopt="TSGO",
                   update_iters=1, rescale=(False, True),
                   svd_alg="gram_eigh", axis_name="dp",
                   platform=mesh_platform(mesh))
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, "dp"), P("dp"), P("dp"), P(), P()),
        out_specs=(P(), P()), check_vma=False))
    txt = fn.lower(rc, rce, sp, sy, sw, 0.05, 1e-10).compile().as_text()
    n_allreduce = len(re.findall(r"= \S+ all-reduce\(", txt))
    assert n_allreduce == 2, f"expected 2 all-reduce ops, found {n_allreduce}"
    # the collective reduces the full bond gradient [chi, d, d, chi, C]
    chi, d = mps.cores.shape[1], mps.cores.shape[2]
    C = mps.center.shape[3]
    assert re.search(rf"f64\[{chi},{d},{d},{chi},{C}\]\S* all-reduce\(", txt)


def test_fit_mps_with_mesh(tiny_problem):
    # end-to-end fit with the sample axis sharded over 8 devices; N=48 is
    # not a multiple of 8 after the class split, exercising the zero-weight
    # padding path too
    import mpstime_tpu as mt
    rng = np.random.default_rng(0)
    T, n = 20, 30   # 30 samples -> pad to 32 on the mesh
    t = np.linspace(0, 2 * np.pi, T)
    X = np.concatenate([np.sin(t[None] + rng.uniform(0, 6, (n // 2, 1))),
                        np.sin(5 * t[None] + rng.uniform(0, 6, (n // 2, 1)))])
    y = np.repeat([0, 1], n // 2)
    opts = mt.MPSOptions(nsweeps=3, chi_max=8, d=3, verbosity=-1,
                         dtype="float64", log_level=0)
    mesh = make_mesh(8)
    trained_m, _, _ = mt.fit_mps(X, y, opts=opts, mesh=mesh)
    trained_s, _, _ = mt.fit_mps(X, y, opts=opts)
    # sharded and single-device training agree up to FP reduction order
    np.testing.assert_allclose(np.asarray(trained_m.mps.center),
                               np.asarray(trained_s.mps.center), atol=1e-8)
    assert np.mean(mt.classify(trained_m, X) == y) >= 0.9


def test_device_farm_matches_sequential_tune(two_class_sines):
    """Fold farming across the 8 virtual devices returns the exact same
    tuning result as the sequential path (jobs are independent and
    deterministic; only placement differs)."""
    import mpstime_tpu as mt

    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                          dtype="float64", sigmoid_transform=True)
    kw = dict(parameters={"chi_max": [6, 10], "d": [3]},
              method=mt.MPSRandomSearch("Exhaustive"),
              objective=mt.MisclassificationRate(), opts0=opts0,
              maxiters=2, verbosity=-1)
    best_seq, cache_seq = mt.tune(Xtr, ytr, 2, **kw)
    best_far, cache_far = mt.tune(Xtr, ytr, 2, devices="all", **kw)
    assert best_seq == best_far
    assert set(cache_seq) == set(cache_far)
    for k in cache_seq:
        np.testing.assert_allclose(cache_seq[k], cache_far[k], rtol=1e-9)


def test_device_farm_places_jobs_on_distinct_devices():
    """jax.default_device pinning is thread-local: concurrent jobs land on
    different devices, not all on device 0."""
    import time

    import jax.numpy as jnp
    from mpstime_tpu.parallel import DeviceFarm

    farm = DeviceFarm("all")

    def job(i):
        x = jnp.full((16, 16), float(i)) @ jnp.eye(16)
        time.sleep(0.05)   # hold the device slot so jobs overlap
        return list(x.devices())[0]

    used = set(farm.map(job, range(8)))
    assert len(used) >= 4, f"jobs ran on only {len(used)} device(s): {used}"


def test_device_farm_error_propagates():
    from mpstime_tpu.parallel import DeviceFarm

    farm = DeviceFarm("all")
    assert len(farm.devices) >= 8

    def boom(i):
        if i == 3:
            raise ValueError("job 3 failed")
        return i * i

    with pytest.raises(ValueError, match="job 3"):
        farm.map(boom, range(8))
    assert farm.map(lambda i: i * i, range(5)) == [0, 1, 4, 9, 16]


def test_divide_devices_partitioning():
    from mpstime_tpu.parallel.farm import divide_devices

    devs = list(range(8))
    # more devices than jobs: contiguous roughly-equal chunks
    assert divide_devices(devs, 2) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    assert divide_devices(devs, 3) == [[0, 1, 2], [3, 4, 5], [6, 7]]
    # fewer devices than jobs: round-robin singletons
    assert divide_devices(devs[:2], 5) == [[0], [1], [0], [1], [0]]
    assert divide_devices(devs, 8) == [[d] for d in devs]
    assert divide_devices(devs, 0) == []


def test_evaluate_nested_device_farming(two_class_sines, tmp_path,
                                        monkeypatch):
    """With more devices than outer folds, evaluate partitions the device
    list between the folds (divide_procs analog) and each fold's inner tune
    farms its CV folds over its sublist."""
    import importlib

    import mpstime_tpu as mt

    # the evaluate FUNCTION shadows the submodule on the package, so fetch
    # the module object explicitly
    eval_mod = importlib.import_module("mpstime_tpu.hyperopt.evaluate")

    seen = []
    real_tune = eval_mod.tune

    def recording_tune(*a, **kw):
        seen.append(kw.get("devices"))
        return real_tune(*a, **kw)

    monkeypatch.setattr(eval_mod, "tune", recording_tune)
    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2, chi_max=8,
                          d=3, dtype="float64", sigmoid_transform=True)
    res = mt.evaluate(Xtr, ytr, nfolds=2, tuning_parameters={"d": [3, 4]},
                      objective=mt.MisclassificationRate(), opts0=opts0,
                      n_cvfolds=2, tuning_maxiters=2, verbosity=-1,
                      devices="all")
    assert len(res) == 2 and all(np.isfinite(r["loss"]) for r in res)
    # each of the 2 folds received a 4-device sublist; the sublists are
    # disjoint and cover all 8 virtual devices
    assert len(seen) == 2
    assert all(devs is not None and len(devs) == 4 for devs in seen)
    all_devs = [d for devs in seen for d in devs]
    assert len(set(all_devs)) == 8


def test_tune_farms_trial_axis(two_class_sines, monkeypatch):
    """With more devices than CV folds, tune farms the TRIAL axis (the
    reference's distribute_iters pmap over trials, random_search.jl:114):
    the grid drains across devices with each trial's folds sequential, and
    the result matches the sequential search exactly."""
    import mpstime_tpu as mt
    from mpstime_tpu.parallel.farm import DeviceFarm

    calls = {"n": 0}
    real_map = DeviceFarm.map

    def counting_map(self, fn, items):
        calls["n"] += 1
        calls["items"] = len(list(items))
        return real_map(self, fn, items)

    monkeypatch.setattr(DeviceFarm, "map", counting_map)
    Xtr, ytr, _, _ = two_class_sines
    kw = dict(nfolds=2,
              parameters={"chi_max": [6, 8, 10, 12], "d": [3]},
              method=mt.MPSRandomSearch("Exhaustive"),
              objective=mt.MisclassificationRate(), rng=5, maxiters=4,
              verbosity=-1,
              opts0=mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                                  dtype="float64", sigmoid_transform=True))
    best_f, cache_f = mt.tune(Xtr, ytr, devices="all", **kw)
    # ONE farm.map over the 4 trials (not one per-trial map over folds)
    assert calls["n"] == 1 and calls["items"] == 4
    best_s, cache_s = mt.tune(Xtr, ytr, **kw)
    assert best_f == best_s
    assert set(cache_f) == set(cache_s)
    for k in cache_f:
        assert cache_f[k] == pytest.approx(cache_s[k], rel=1e-9)


def test_de_population_farms_devices(two_class_sines, monkeypatch):
    """ScipySolver differential_evolution farms each generation's population
    energies over the DeviceFarm (deferred updating => identical trajectory
    to the sequential run at a fixed seed)."""
    import mpstime_tpu as mt
    from mpstime_tpu.parallel.farm import DeviceFarm

    calls = {"n": 0, "max_items": 0}
    real_map = DeviceFarm.map

    def counting_map(self, fn, items):
        items = list(items)
        calls["n"] += 1
        calls["max_items"] = max(calls["max_items"], len(items))
        return real_map(self, fn, items)

    monkeypatch.setattr(DeviceFarm, "map", counting_map)
    Xtr, ytr, _, _ = two_class_sines
    kw = dict(nfolds=2,
              parameters={"chi_max": (4, 10), "eta": (0.1, 2.0)},
              method=mt.ScipySolver("differential_evolution", popsize=4),
              # budget covers init + 2 full generations (8 + 2*8 = 24), so
              # the mid-generation exhaustion stop — where farmed and
              # sequential runs legitimately cancel different in-flight
              # jobs — never fires and the trajectories match exactly
              objective=mt.MisclassificationRate(), rng=3, maxiters=24,
              verbosity=-1,
              opts0=mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                                  chi_max=8, d=3, dtype="float64",
                                  sigmoid_transform=True))
    best_f, cache_f = mt.tune(Xtr, ytr, devices="all", **kw)
    # the population (popsize * ndim = 8 energies) went through farm.map
    assert calls["n"] >= 1 and calls["max_items"] >= 8, calls
    best_s, cache_s = mt.tune(Xtr, ytr, **kw)
    assert best_f == best_s
    assert set(cache_f) == set(cache_s)
    for k in cache_f:
        assert cache_f[k] == pytest.approx(cache_s[k], rel=1e-9)


def test_evaluate_device_farm(two_class_sines, tmp_path):
    import mpstime_tpu as mt

    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2, chi_max=8,
                          d=3, dtype="float64", sigmoid_transform=True)
    res = mt.evaluate(Xtr, ytr, nfolds=2, tuning_parameters={"d": [3]},
                      objective=mt.MisclassificationRate(), opts0=opts0,
                      n_cvfolds=2, tuning_maxiters=1, verbosity=-1,
                      devices="all", write=True, writedir=str(tmp_path),
                      simname="farm_eval")
    assert len(res) == 2
    assert all(np.isfinite(r["loss"]) for r in res)
    assert [r["fold"] for r in res] == [0, 1]


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (100, 2)
