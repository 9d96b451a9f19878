"""Parity tests for the fused Pallas bond step (ops/pallas_bond.py).

Run in Pallas interpreter mode on CPU: the kernels must reproduce the XLA
warm-split bond step bit-for-bit up to f32 reassociation noise, and a short
training run through the Pallas path must reach the same accuracy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mpstime_tpu as mt
from mpstime_tpu.ops import pallas_bond
from mpstime_tpu.ops.bond_update import apply_update
from mpstime_tpu.ops.decomp import (warm_sketch_init, warm_split_left,
                                    warm_split_right)
from mpstime_tpu.ops.env import env_step_left_scaled, env_step_right_scaled


@pytest.fixture
def interpret():
    pallas_bond.set_interpret(True)
    jax.clear_caches()
    yield
    pallas_bond.set_interpret(False)
    jax.clear_caches()


def _rand_bond(chi=6, d=3, C=2, N=12, seed=1):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    return dict(
        A=jnp.asarray(rng.standard_normal((chi, d, chi)).astype(f32)),
        center=jnp.asarray(rng.standard_normal((chi, d, chi, C)).astype(f32)),
        le=jnp.asarray(rng.standard_normal((N, chi)).astype(f32)),
        re=jnp.asarray(rng.standard_normal((N, chi)).astype(f32)),
        re_ls=jnp.asarray(rng.standard_normal(N).astype(f32)),
        phil=jnp.asarray(rng.uniform(-0.8, 0.8, (N, d)).astype(f32)),
        phir=jnp.asarray(rng.uniform(-0.8, 0.8, (N, d)).astype(f32)),
        y1h=jnp.asarray(np.eye(C, dtype=f32)[rng.integers(0, C, N)]),
        w=jnp.full((N,), 1.0 / N, jnp.float32),
        chi=chi, d=d, C=C, N=N,
    )


class TestPallasBondParity:
    @pytest.mark.parametrize("q", [1, 3])
    @pytest.mark.parametrize("orth", ["qr", "ns"])
    def test_backward_bond_matches_xla(self, interpret, q, orth):
        b = _rand_bond()
        chi, d, C = b["chi"], b["d"], b["C"]
        eta = jnp.float32(0.05)
        cutoff = jnp.float32(1e-10)
        V0 = warm_sketch_init(d * chi, chi, np.float32)

        BT = jnp.einsum("aim,mkbc->aikbc", b["A"], b["center"])
        _, BT2 = apply_update(BT, b["le"], b["re"], b["phil"], b["phir"],
                              b["y1h"], b["w"], jnp.zeros(b["N"], jnp.float32), eta=eta,
                              loss="KLD", bbopt="TSGO", update_iters=1,
                              rescale=(False, True))
        M = BT2.transpose(0, 1, 4, 2, 3).reshape(chi * d * C, d * chi)
        US, Vh, Qv = warm_split_left(M, V0, chi, cutoff, q=q, orth=orth)
        center_x = US.reshape(chi, d, C, chi).transpose(0, 1, 3, 2)
        V_x = Vh.reshape(chi, d, chi)
        v2_x, ls2_x = env_step_right_scaled(b["re"], b["re_ls"], V_x,
                                            b["phir"])

        cp, Vp, v2p, ls2p, Qvp = pallas_bond.bond_step(
            b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
            b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], V0,
            eta, cutoff, forward=False, power_iters=q, orth=orth)
        np.testing.assert_allclose(np.moveaxis(np.asarray(cp), 0, 3),
                                   np.asarray(center_x), rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(Vp), np.asarray(V_x),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(v2p), np.asarray(v2_x),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(ls2p), np.asarray(ls2_x),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(Qvp), np.asarray(Qv),
                                   rtol=1e-4, atol=3e-5)

    @pytest.mark.parametrize("q", [1, 3])
    @pytest.mark.parametrize("orth", ["qr", "ns"])
    def test_forward_bond_matches_xla(self, interpret, q, orth):
        b = _rand_bond(seed=3)
        chi, d, C = b["chi"], b["d"], b["C"]
        eta = jnp.float32(0.05)
        cutoff = jnp.float32(1e-10)
        U0 = warm_sketch_init(chi * d, chi, np.float32)

        BTf = jnp.einsum("aimc,mkb->aikbc", b["center"], b["A"])
        _, BTf2 = apply_update(BTf, b["le"], b["re"], b["phil"], b["phir"],
                               b["y1h"], b["w"], jnp.zeros(b["N"], jnp.float32), eta=eta,
                               loss="KLD", bbopt="TSGO", update_iters=1,
                               rescale=(False, True))
        Mf = BTf2.reshape(chi * d, d * chi * C)
        Uu, SVh, Qu = warm_split_right(Mf, U0, chi, cutoff, q=q, orth=orth)
        U_x = Uu.reshape(chi, d, chi)
        center_x = SVh.reshape(chi, d, chi, C)
        v2_x, ls2_x = env_step_left_scaled(b["le"], b["re_ls"], U_x,
                                           b["phil"])

        cp, Up, v2p, ls2p, Qup = pallas_bond.bond_step(
            b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
            b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], U0,
            eta, cutoff, forward=True, power_iters=q, orth=orth)
        np.testing.assert_allclose(np.moveaxis(np.asarray(cp), 0, 3),
                                   np.asarray(center_x), rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(Up), np.asarray(U_x),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(v2p), np.asarray(v2_x),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(ls2p), np.asarray(ls2_x),
                                   rtol=1e-4, atol=3e-5)

    def test_frozen_bond_matches_xla(self, interpret):
        # refresh=False: split against the cached orthonormal basis directly
        b = _rand_bond(seed=5)
        chi, d, C = b["chi"], b["d"], b["C"]
        eta = jnp.float32(0.05)
        cutoff = jnp.float32(1e-10)
        V0 = warm_sketch_init(d * chi, chi, np.float32)

        BT = jnp.einsum("aim,mkbc->aikbc", b["A"], b["center"])
        _, BT2 = apply_update(BT, b["le"], b["re"], b["phil"], b["phir"],
                              b["y1h"], b["w"], jnp.zeros(b["N"], jnp.float32), eta=eta,
                              loss="KLD", bbopt="TSGO", update_iters=1,
                              rescale=(False, True))
        M = BT2.transpose(0, 1, 4, 2, 3).reshape(chi * d * C, d * chi)
        US, Vh, Qv = warm_split_left(M, V0, chi, cutoff, refresh=False)
        center_x = US.reshape(chi, d, C, chi).transpose(0, 1, 3, 2)

        cp, Vp, v2p, ls2p, Qvp = pallas_bond.bond_step(
            b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
            b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], V0,
            eta, cutoff, forward=False, refresh=False)
        np.testing.assert_allclose(np.moveaxis(np.asarray(cp), 0, 3),
                                   np.asarray(center_x), rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(Qvp), np.asarray(V0),
                                   rtol=1e-5, atol=1e-6)

    def test_cutoff_tie_break_matches_trunc_mask(self, interpret):
        # Degenerate spectra: when the cutoff boundary falls inside a group
        # of exactly-tied direction energies, the sort-free kernel rule must
        # truncate the same strict subset as the XLA paths' stable
        # descending sort (_trunc_mask over argsort(-w)): ties broken by
        # index, lower index kept preferentially.
        from mpstime_tpu.ops.decomp import _trunc_mask
        from mpstime_tpu.ops.pallas_bond import _k2_call

        chi, d, C, N = 6, 2, 1, 4
        w = np.array([4.0, 2.0, 2.0, 2.0, 1.0, 0.5], np.float32)
        # BT[0, i, 0, j] = sqrt(w_j) delta_ij; k=1 block zero
        BT = np.zeros((C, chi * d, d, chi), np.float32)
        BT[0, :chi, 0, :] = np.diag(np.sqrt(w))
        # Q selects the k=0 block: projected energies are exactly w
        Q = np.zeros((d * chi, chi), np.float32)
        Q[:chi, :] = np.eye(chi, dtype=np.float32)
        env = np.zeros((N, chi), np.float32)
        env[:, 0] = 1.0
        phi = np.full((N, d), 0.5, np.float32)
        # boundary inside the tie group: suffix sums are
        # [11.5, 7.5, 5.5, 3.5, 1.5, 0.5]; cutoff*total = 4.5 keeps idx 0..2
        cutoff = jnp.float32(4.5 / w.sum())
        center, core, _, _ = _k2_call(
            jnp.stack([cutoff, jnp.float32(chi)])[None, :],
            jnp.asarray(BT), jnp.asarray(Q),
            jnp.asarray(env), jnp.zeros((N, 1), jnp.float32),
            jnp.asarray(phi), C=C, chi=chi, d=d, forward=False)
        kept_kernel = np.abs(np.asarray(center[0]).reshape(chi * d, chi)
                             ).sum(axis=0) > 0
        expect = np.asarray(_trunc_mask(jnp.asarray(np.sort(w)[::-1].copy()),
                                        chi, cutoff)) > 0
        # stable order: among the tied 2.0s the lower indices survive
        np.testing.assert_array_equal(kept_kernel,
                                      [True, True, True, False, False, False])
        assert kept_kernel.sum() == expect.sum()

    @pytest.mark.parametrize("forward", [False, True])
    @pytest.mark.parametrize("q", [1, 3])
    def test_split_tail_route_matches_monolith(self, interpret, monkeypatch,
                                               forward, q):
        # Large-chi route: past SPLIT_TAIL_FOOTPRINT bond_step runs K1 with
        # emit_y=False and the warm power step as its own kernel reading BT
        # back (the in-kernel tail crashes the Mosaic compiler at chi=320).
        # Forced here at tiny shapes: both routes apply identical ops to
        # identical values, so outputs agree to f32 reassociation noise.
        b = _rand_bond(seed=7)
        eta = jnp.float32(0.05)
        cutoff = jnp.float32(1e-10)
        V0 = warm_sketch_init(b["d"] * b["chi"], b["chi"], np.float32)
        args = (b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
                b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], V0,
                eta, cutoff)
        mono = pallas_bond.bond_step(*args, forward=forward, power_iters=q)
        monkeypatch.setattr(pallas_bond, "SPLIT_TAIL_FOOTPRINT", 0)
        split = pallas_bond.bond_step(*args, forward=forward, power_iters=q)
        for m, s in zip(mono, split):
            np.testing.assert_allclose(np.asarray(s), np.asarray(m),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("forward", [False, True])
    @pytest.mark.parametrize("refresh,orth,q", [(True, "ns", 1),
                                                (True, "ns", 3),
                                                (False, "qr", 1)])
    def test_block_steps_match_single_chain(self, interpret, forward,
                                            refresh, orth, q):
        # The multi-bond block kernel (K12m) must reproduce the chained
        # single-bond K12 exactly: the center carry goes value->scratch->
        # strided read (same access pattern as the single kernel's HBM
        # input), and the forward merged view is rebuilt with exact one-hot
        # scatter matmuls — so parity is bit-level, not just tolerance.
        from mpstime_tpu.ops.pallas_bond import bond_block_steps

        rng = np.random.default_rng(13)
        chi, d, C, N, Bb = 6, 3, 2, 12, 4
        f32 = np.float32

        def r(*s):
            return jnp.asarray(rng.standard_normal(s).astype(f32))

        A_blk = r(Bb, chi, d, chi)
        center = r(C, chi, d, chi)
        envx_blk = r(Bb, N, chi)
        phil_blk = jnp.asarray(rng.uniform(-0.8, 0.8, (Bb, N, d)).astype(f32))
        phir_blk = jnp.asarray(rng.uniform(-0.8, 0.8, (Bb, N, d)).astype(f32))
        y1h = jnp.asarray(np.eye(C, dtype=f32)[rng.integers(0, C, N)])
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        env0, ls0 = r(N, chi), r(N)
        V0_blk = jnp.stack([warm_sketch_init(d * chi, chi, f32)] * Bb)
        eta, cutoff = jnp.float32(0.05), jnp.float32(1e-10)

        c_ref, env, ls = center, env0, ls0
        singles = []
        for b in range(Bb):
            le = envx_blk[b] if not forward else env
            re = env if not forward else envx_blk[b]
            c_ref, V, env, ls, Q = pallas_bond.bond_step(
                A_blk[b], c_ref, le, re, ls, phil_blk[b], phir_blk[b],
                y1h, w, V0_blk[b], eta, cutoff, forward=forward,
                refresh=refresh, power_iters=q, orth=orth)
            singles.append((V, env, ls, Q))

        c_blk, V_blk, env_blk, ls_blk, q_blk = bond_block_steps(
            A_blk, center, envx_blk, env0, ls0, phil_blk, phir_blk, y1h,
            w, V0_blk, eta, cutoff, forward=forward, refresh=refresh,
            power_iters=q, orth=orth)
        np.testing.assert_allclose(np.asarray(c_blk), np.asarray(c_ref),
                                   rtol=1e-6, atol=1e-7)
        for b, (V, env, ls, Q) in enumerate(singles):
            np.testing.assert_allclose(np.asarray(V_blk[b]), np.asarray(V),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(env_blk[b]),
                                       np.asarray(env), rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(ls_blk[b]), np.asarray(ls),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(q_blk[b]), np.asarray(Q),
                                       rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("orth,refresh_every", [("ns", 1), ("qr", 2)])
    def test_blocked_training_matches_unblocked(self, interpret, ecg200,
                                                monkeypatch, orth,
                                                refresh_every):
        # Through the public boundary: an ns-route fit with the auto block
        # size (T=96 -> BB=8, 95 bonds = 11 blocks + 7 remainder) equals
        # the BOND_BLOCK=1 run bit-for-bit at fixed seed.  The (qr, 2)
        # case pins the frozen-sweep block route: under a refresh cadence
        # the frozen sweeps block under ANY orth while qr refresh sweeps
        # stay single-bond — a mixed program.
        from mpstime_tpu.training import sweep

        Xtr, ytr, *_ = ecg200
        Xtr, ytr = Xtr[:30], ytr[:30]
        opts = mt.MPSOptions(nsweeps=2 * refresh_every, chi_max=10, d=3,
                             verbosity=-1, log_level=-1, dtype="float32",
                             svd_alg="randomized_warm", orth_alg=orth,
                             subspace_refresh_every=refresh_every)
        blocked, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        monkeypatch.setattr(sweep, "BOND_BLOCK", 1)
        jax.clear_caches()
        single, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        np.testing.assert_array_equal(np.asarray(blocked.mps.center),
                                      np.asarray(single.mps.center))
        np.testing.assert_array_equal(np.asarray(blocked.mps.cores),
                                      np.asarray(single.mps.cores))

    def test_bond_block_env_override(self, monkeypatch):
        # MPSTIME_TPU_BOND_BLOCK is the subprocess-friendly hatch for the
        # block route: it overrides auto sizing, and module state wins
        # over it when both are set
        from mpstime_tpu.training import sweep

        shape = dict(C=2, chi=64, d=5, N=100, T=96)
        monkeypatch.setattr(sweep, "BOND_BLOCK", None)
        auto = sweep._auto_block(*shape.values())
        assert auto > 1
        monkeypatch.setenv("MPSTIME_TPU_BOND_BLOCK", "1")
        assert sweep._auto_block(*shape.values()) == 1
        monkeypatch.setenv("MPSTIME_TPU_BOND_BLOCK", "3")
        assert sweep._auto_block(*shape.values()) == 3
        monkeypatch.setattr(sweep, "BOND_BLOCK", 2)
        assert sweep._auto_block(*shape.values()) == 2

    def test_blocked_sweep_launch_structure(self, interpret):
        # Structural contract of the block route: each half-sweep compiles
        # to a block scan whose body is ONE pallas_call covering Bb bonds,
        # plus ONE loose remainder-block kernel — so a full ns sweep at
        # T=96 (95 bonds = 11x8 + 7) is 24 kernel launches: 2 scans of 11
        # single-kernel bodies + 2 rem-sized tail blocks.
        from mpstime_tpu.training.sweep import _sweep_once

        T, chi, d, C, N = 96, 8, 3, 2, 10
        rng = np.random.default_rng(3)
        f32 = np.float32
        cores = jnp.asarray(rng.standard_normal((T, chi, d, chi))
                            .astype(f32))
        center = jnp.asarray(rng.standard_normal((chi, d, chi, C))
                             .astype(f32))
        phis = jnp.asarray(rng.uniform(-0.8, 0.8, (T, N, d)).astype(f32))
        y1h = jnp.asarray(np.eye(C, dtype=f32)[rng.integers(0, C, N)])
        w = jnp.full((N,), 1.0 / N, jnp.float32)

        jaxpr = jax.make_jaxpr(lambda *a: _sweep_once(
            *a, loss="KLD", bbopt="TSGO", update_iters=1,
            rescale=(False, True), svd_alg="randomized_warm",
            power_iters=1, orth="ns"))(
            cores, center, phis, y1h, w, jnp.float32(0.05),
            jnp.float32(1e-10))

        scan_counts = []
        loose = [0]

        def walk(jx, in_scan):
            for e in jx.eqns:
                if e.primitive.name == "pallas_call" and not in_scan:
                    loose[0] += 1
                for v in e.params.values():
                    inner = getattr(v, "jaxpr", None)
                    if inner is None:
                        continue
                    if e.primitive.name == "scan":
                        n = sum(ee.primitive.name == "pallas_call"
                                for ee in inner.eqns)
                        if n:
                            scan_counts.append(n)
                        walk(inner, True)
                    else:
                        walk(inner, in_scan)

        walk(jaxpr.jaxpr, False)
        assert sorted(scan_counts) == [1, 1], scan_counts
        assert loose[0] == 2, loose[0]

    @pytest.mark.parametrize("forward", [False, True])
    def test_kernel_launch_count(self, interpret, forward):
        # Pin the per-bond pallas_call count (the K12 contract): with
        # orth="ns" nothing runs outside the kernel between K1 and K2, so a
        # refresh bond is ONE kernel and the bond tensor never leaves VMEM;
        # frozen bonds are one kernel under any orth; the qr route stays
        # two kernels around the XLA QR.
        b = _rand_bond(seed=11)
        eta = jnp.float32(0.05)
        cutoff = jnp.float32(1e-10)
        V0 = warm_sketch_init(b["d"] * b["chi"], b["chi"], np.float32)
        args = (b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
                b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], V0,
                eta, cutoff)

        def n_kernels(**kw):
            jaxpr = jax.make_jaxpr(
                lambda *a: pallas_bond.bond_step(*a, forward=forward,
                                                 **kw))(*args)
            return sum(e.primitive.name == "pallas_call"
                       for e in jaxpr.jaxpr.eqns)

        assert n_kernels(orth="ns") == 1
        assert n_kernels(orth="ns", refresh=False) == 1
        assert n_kernels(orth="qr", refresh=False) == 1
        assert n_kernels(orth="qr") == 2

    def test_training_through_pallas_path(self, interpret, ecg200):
        # a short real training run through the interpreted Pallas sweep
        # reaches the same accuracy regime as the XLA path
        Xtr, ytr, *_ = ecg200
        Xtr, ytr = Xtr[:40], ytr[:40]
        opts = mt.MPSOptions(nsweeps=3, chi_max=12, d=3, verbosity=-1,
                             log_level=-1, dtype="float32",
                             svd_alg="randomized_warm")
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        acc = np.mean(mt.classify(trained, Xtr) == ytr)
        assert acc >= 0.9


class TestLossOptimiserVariants:
    """r5 eligibility widening: the fused kernels cover {KLD, MSE} x
    {TSGO, GD} on the real path (VERDICT r4 weak #7).  The MSE gradient
    needs the true-scale yhat, so the bond step takes the TOTAL env
    log-scales (opp_ls + the advancing side's env_ls)."""

    @pytest.mark.parametrize("forward", [False, True])
    @pytest.mark.parametrize("loss,bbopt", [("MSE", "TSGO"), ("KLD", "GD"),
                                            ("MSE", "GD")])
    def test_bond_matches_xla(self, interpret, forward, loss, bbopt):
        b = _rand_bond(seed=11)
        chi, d, C, N = b["chi"], b["d"], b["C"], b["N"]
        rng = np.random.default_rng(12)
        le_ls = jnp.asarray(0.3 * rng.standard_normal(N).astype(np.float32))
        eta, cutoff = jnp.float32(0.05), jnp.float32(1e-10)
        total_ls = le_ls + b["re_ls"]

        if forward:
            BT = jnp.einsum("aimc,mkb->aikbc", b["center"], b["A"])
        else:
            BT = jnp.einsum("aim,mkbc->aikbc", b["A"], b["center"])
        _, BT2 = apply_update(BT, b["le"], b["re"], b["phil"], b["phir"],
                              b["y1h"], b["w"], total_ls, eta=eta,
                              loss=loss, bbopt=bbopt, update_iters=1,
                              rescale=(False, True))
        if forward:
            M = BT2.reshape(chi * d, d * chi * C)
            V0 = warm_sketch_init(chi * d, chi, np.float32)
            Uu, SVh, _ = warm_split_right(M, V0, chi, cutoff, q=1, orth="ns")
            core_x = Uu.reshape(chi, d, chi)
            center_x = SVh.reshape(chi, d, chi, C)
        else:
            M = BT2.transpose(0, 1, 4, 2, 3).reshape(chi * d * C, d * chi)
            V0 = warm_sketch_init(d * chi, chi, np.float32)
            US, Vh, _ = warm_split_left(M, V0, chi, cutoff, q=1, orth="ns")
            center_x = US.reshape(chi, d, C, chi).transpose(0, 1, 3, 2)
            core_x = Vh.reshape(chi, d, chi)

        # backward advances (re, re_ls); forward advances (le, le_ls):
        # the bond step's env_ls is the advancing side's, opp_ls the other
        adv_ls = le_ls if forward else b["re_ls"]
        opp_ls = b["re_ls"] if forward else le_ls
        cp, Vp, _, _, _ = pallas_bond.bond_step(
            b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
            adv_ls, b["phil"], b["phir"], b["y1h"], b["w"], V0,
            eta, cutoff, forward=forward, power_iters=1, orth="ns",
            loss=loss, bbopt=bbopt, opp_ls=opp_ls)
        np.testing.assert_allclose(np.moveaxis(np.asarray(cp), 0, 3),
                                   np.asarray(center_x), rtol=1e-4,
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(Vp), np.asarray(core_x),
                                   rtol=1e-4, atol=3e-5)

    @pytest.mark.parametrize("loss,bbopt", [("MSE", "TSGO"), ("KLD", "GD")])
    def test_dp_split_matches_fused(self, interpret, loss, bbopt):
        # the grad/update split route (dp decomposition, axis_name=None
        # equivalent: streaming) must agree with the monolithic kernel
        b = _rand_bond(seed=21, N=13)
        chi, d = b["chi"], b["d"]
        rng = np.random.default_rng(22)
        le_ls = jnp.asarray(
            0.3 * rng.standard_normal(b["N"]).astype(np.float32))
        eta, cutoff = jnp.float32(0.05), jnp.float32(1e-10)
        V0 = warm_sketch_init(d * chi, chi, np.float32)
        args = (b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
                b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], V0,
                eta, cutoff)
        kw = dict(forward=False, refresh=True, power_iters=1, orth="ns",
                  loss=loss, bbopt=bbopt, opp_ls=le_ls)
        ref = pallas_bond.bond_step(*args, **kw)
        out = pallas_bond.bond_step(*args, stream_tile=5, **kw)
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("loss,bbopt", [("MSE", "TSGO"), ("KLD", "GD"),
                                            ("MSE", "GD")])
    def test_full_sweep_matches_xla_route(self, interpret, loss, bbopt):
        # whole-sweep parity: the fused route (interpret) against the same
        # sweep forced onto the XLA bond path via the platform sentinel
        from mpstime_tpu.training.sweep import full_sweep
        rng = np.random.default_rng(31)
        T, chi, d, C, N = 6, 6, 3, 2, 12
        f32 = np.float32
        cores = jnp.asarray(rng.standard_normal((T, chi, d, chi)).astype(f32)
                            * 0.3)
        center = jnp.asarray(
            rng.standard_normal((chi, d, chi, C)).astype(f32) * 0.3)
        phis = jnp.asarray(rng.uniform(-0.8, 0.8, (T, N, d)).astype(f32))
        y1h = jnp.asarray(np.eye(C, dtype=f32)[rng.integers(0, C, N)])
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        kw = dict(loss=loss, bbopt=bbopt, update_iters=1,
                  rescale=(False, True), svd_alg="randomized_warm",
                  power_iters=1, orth="ns")
        c_x, z_x = full_sweep(cores, center, phis, y1h, w, jnp.float32(0.05),
                              jnp.float32(1e-10), platform="xla", **kw)
        c_p, z_p = full_sweep(cores, center, phis, y1h, w, jnp.float32(0.05),
                              jnp.float32(1e-10), **kw)
        # f32 reassociation compounds across the 2T bond updates (GD's
        # un-normalized KLD gradient amplifies it most: measured max abs
        # drift 2.7e-4); the tight semantic check is the per-bond
        # test_bond_matches_xla above — real route bugs show up O(1) here.
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("loss,bbopt,eta,floor", [
        ("KLD", "GD", 0.05, 0.95),
        # MSE's raw gradient is tiny for a normalized MPS (resid * w *
        # exp(env_ls) — no 1/y_true amplification), so fixed-step GD needs
        # a large eta to move at all; it is also the weaker loss (the f64
        # CGDx5 variant test uses a 0.7 floor on this same problem)
        ("MSE", "GD", 1e5, 0.8),
    ])
    def test_training_through_pallas_path(self, interpret, loss, bbopt,
                                          eta, floor):
        # short training through the interpreted fused sweep learns on a
        # well-separated two-sine problem (train-set accuracy)
        rng = np.random.default_rng(42)
        T, n_per = 20, 24
        t = np.linspace(0, 2 * np.pi, T)

        def make(f, n):
            return (np.sin(f * t[None] + rng.uniform(0, 2 * np.pi, (n, 1)))
                    + 0.05 * rng.standard_normal((n, T)))

        X = np.concatenate([make(1.0, n_per), make(5.0, n_per)])
        y = np.repeat([0, 1], n_per)
        opts = mt.MPSOptions(nsweeps=5, chi_max=12, d=4, verbosity=-1,
                             log_level=-1, dtype="float32", loss_grad=loss,
                             bbopt=bbopt, eta=eta,
                             svd_alg="randomized_warm")
        trained, _, _ = mt.fit_mps(X, y, opts=opts)
        acc = np.mean(mt.classify(trained, X) == y)
        assert acc >= floor


class TestStreamedBondStep:
    """The N-streaming route (ops/pallas_bond._bond_step_streamed) must
    match the plain fused bond step exactly up to f32 reassociation: the
    gradient is accumulated tile-by-tile (same dp decomposition), the
    update/split run once, env advances per tile, pad rows (w=0) drop."""

    @pytest.mark.parametrize("forward", [False, True])
    @pytest.mark.parametrize("refresh,orth,q", [(True, "ns", 3),
                                                (True, "qr", 1),
                                                (False, "qr", 1)])
    def test_streamed_matches_plain(self, interpret, forward, refresh,
                                    orth, q):
        b = _rand_bond(seed=51, N=13)          # 13 rows, tile 5 -> 3 tiles
        chi, d = b["chi"], b["d"]              # (last one 60% padding)
        eta, cutoff = jnp.float32(0.05), jnp.float32(1e-10)
        V0 = warm_sketch_init((d * chi) if not forward else (chi * d),
                              chi, np.float32)
        args = (b["A"], jnp.moveaxis(b["center"], 3, 0), b["le"], b["re"],
                b["re_ls"], b["phil"], b["phir"], b["y1h"], b["w"], V0,
                eta, cutoff)
        kw = dict(forward=forward, refresh=refresh, power_iters=q,
                  orth=orth)
        ref = pallas_bond.bond_step(*args, **kw)
        out = pallas_bond.bond_step(*args, stream_tile=5, **kw)
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=2e-4, atol=1e-5)

    def test_stream_tile_for_policy(self):
        from mpstime_tpu.ops.pallas_bond import (SPLIT_TAIL_FOOTPRINT,
                                                 kernel_footprint,
                                                 stream_tile_for)
        # small shapes fit outright -> no streaming
        assert stream_tile_for(2, 64, 5, 100) is None
        # huge batch at moderate chi -> a tile that fits the two-kernel
        # range
        t = stream_tile_for(2, 64, 5, 100_000)
        assert t is not None and t % 256 == 0
        assert kernel_footprint(2, 64, 5, t) <= SPLIT_TAIL_FOOTPRINT
        # bt-dominated shapes cannot be saved by batch streaming
        assert stream_tile_for(2, 384, 5, 100) is None

    def test_full_sweep_streamed_matches_fused(self, interpret, monkeypatch):
        # Force the sweep engine onto the N-streaming route (vmem gate
        # closed, tiny tile) and compare a full sweep against the plain
        # fused route.
        from mpstime_tpu.training import sweep as sweep_mod
        from mpstime_tpu.training.sweep import full_sweep
        rng = np.random.default_rng(71)
        T, chi, d, C, N = 6, 6, 3, 2, 13
        f32 = np.float32
        cores = jnp.asarray(rng.standard_normal((T, chi, d, chi)).astype(f32))
        center = jnp.asarray(
            rng.standard_normal((chi, d, chi, C)).astype(f32))
        phis = jnp.asarray(rng.uniform(-0.8, 0.8, (T, N, d)).astype(f32))
        y1h = jnp.asarray(np.eye(C, dtype=f32)[rng.integers(0, C, N)])
        w = jnp.full((N,), 1.0 / N, jnp.float32)
        kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
                  rescale=(False, True), svd_alg="randomized_warm",
                  power_iters=1, orth="ns")
        c_ref, z_ref = full_sweep(cores, center, phis, y1h, w,
                                  jnp.float32(0.05), jnp.float32(1e-10),
                                  **kw)
        monkeypatch.setattr(sweep_mod, "_pallas_vmem_ok",
                            lambda *a, **k: False)
        monkeypatch.setattr(pallas_bond, "stream_tile_for",
                            lambda *a, **k: 5)
        jax.clear_caches()
        c_s, z_s = full_sweep(cores, center, phis, y1h, w,
                              jnp.float32(0.05), jnp.float32(1e-10), **kw)
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_ref),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_ref),
                                   rtol=2e-4, atol=1e-5)
