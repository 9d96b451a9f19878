import jax.numpy as jnp
import numpy as np
import pytest

import mpstime_tpu as mt_top
from mpstime_tpu import MPSOptions, encode_dataset, get_encoding, function_basis
from mpstime_tpu.encodings import bases, encode_series


def _leg_norm(l):
    return np.sqrt((2 * l + 1) / 2.0)


class TestLegendre:
    def test_values_match_closed_form(self):
        # reference bases.jl:77-92: normalised Legendre polynomials
        x = np.array([-1.0, -0.3, 0.0, 0.5, 1.0])
        out = np.asarray(bases.legendre_encode(jnp.asarray(x), 4))
        P = np.stack([np.ones_like(x), x, 0.5 * (3 * x ** 2 - 1),
                      0.5 * (5 * x ** 3 - 3 * x)], axis=-1)
        expect = P * np.array([_leg_norm(l) for l in range(4)])
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_norm_variant_formula(self):
        # legendre_norm divides by sqrt(P~_d(1) * d) (bases.jl:86-89).
        # (The reference's "|phi|^2 <= 1" comment is only approximate: at
        # x=+-1 the norm is d / (2 sqrt((2d+1)/2)), >1 for d>=5.)
        d = 6
        x = np.linspace(-1, 1, 201)
        out = np.asarray(bases.legendre_encode(jnp.asarray(x), d, norm=True))
        plain = np.asarray(bases.legendre_encode(jnp.asarray(x), d, norm=False))
        scale = np.sqrt(np.sqrt((2 * d + 1) / 2.0) * d)
        np.testing.assert_allclose(out, plain / scale, atol=1e-12)
        peak = np.sum(out ** 2, axis=-1).max()
        assert peak == pytest.approx(d / (2 * np.sqrt((2 * d + 1) / 2)), rel=1e-6)


class TestFourier:
    def test_freq_selection(self):
        # bases.jl:27-34: [0, 1, -1, 2, -2, ...]
        np.testing.assert_array_equal(bases.get_fourier_freqs(5), [0, 1, -1, 2, -2])
        np.testing.assert_array_equal(bases.get_fourier_freqs(4), [0, 1, -1, 2])

    def test_values(self):
        x = np.array([0.25, -0.7])
        out = np.asarray(bases.fourier_encode(jnp.asarray(x), 3))
        expect = np.exp(1j * np.pi * x[:, None] * np.array([0, 1, -1])) / np.sqrt(3)
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_unit_norm(self):
        x = np.linspace(-1, 1, 50)
        out = np.asarray(bases.fourier_encode(jnp.asarray(x), 7))
        np.testing.assert_allclose(np.sum(np.abs(out) ** 2, axis=-1), 1.0, atol=1e-12)


class TestStoudenmire:
    def test_unit_norm_and_values(self):
        x = np.linspace(0, 1, 33)
        out = np.asarray(bases.angle_encode(jnp.asarray(x)))
        np.testing.assert_allclose(np.sum(np.abs(out) ** 2, axis=-1), 1.0, atol=1e-12)
        # x=0 -> [1, 0]; x=1 -> [e^{3i pi/2} cos(pi/2), ...] = [0, -i*... ]
        np.testing.assert_allclose(out[0], [1.0, 0.0], atol=1e-12)

    def test_d_not_2_raises(self):
        with pytest.raises(ValueError):
            bases.angle_encode(jnp.zeros(3), d=3)


class TestSahand:
    def test_even_d_required(self):
        with pytest.raises(ValueError):
            bases.sahand_encode(jnp.zeros(3), 3)

    def test_support_structure(self):
        # bases.jl:53-74: component i lives on interval ceil(i/2)
        d = 4
        out = np.asarray(bases.sahand_encode(jnp.asarray([0.1]), d))[0]
        # x=0.1 is in interval 1 ([0, 0.5]) -> components 3,4 (interval 2) zero
        assert abs(out[0]) > 0
        assert out[2] == 0 and out[3] == 0


class TestUniform:
    def test_values(self):
        out = np.asarray(bases.uniform_encode(jnp.asarray([0.3, 0.9]), 5))
        np.testing.assert_allclose(out, 0.2)


class TestConstructors:
    def test_reference_export_parity(self):
        # every exported basis constructor of the reference
        # (src/MPSTime.jl:126-135) has an equivalent here
        assert mt_top.stoudenmire().name == "Stoudenmire"
        assert mt_top.fourier().is_complex
        assert mt_top.legendre().name == "Legendre"
        assert mt_top.legendre(norm=True).name == "Legendre_Norm"
        assert mt_top.legendre_no_norm().name == "Legendre"
        assert mt_top.sahand().range == (0.0, 1.0)
        assert mt_top.uniform().name == "Uniform"
        assert mt_top.sahand_legendre().is_time_dependent
        assert not mt_top.sahand_legendre(False).is_time_dependent
        assert mt_top.histogram_split("fourier").is_complex
        assert mt_top.uniform_split("legendre").name.startswith("Unif Split")
        assert mt_top.fourier(project=True).is_data_driven

    def test_erf_is_placeholder(self):
        # the reference's erf() basis errors on use (basis_structs.jl:178-185)
        with pytest.raises(NotImplementedError, match="placeholder"):
            get_encoding("erf")


class TestPipeline:
    def test_sorted_by_class(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, (10, 6))
        y = np.array([1, 0, 1, 0, 1, 1, 0, 1, 0, 0])
        opts = MPSOptions(d=3, verbosity=-1)
        ds = encode_dataset(X, X, y, opts)
        assert (np.diff(ds.y_idx) >= 0).all()
        np.testing.assert_array_equal(ds.class_distribution, [5, 5])
        assert ds.X_enc.shape == (10, 6, 3)
        # encoded rows correspond to sorted original rows
        first_c0 = np.where(y == 0)[0][0]
        np.testing.assert_allclose(
            np.asarray(ds.X_enc[0]),
            np.asarray(bases.legendre_encode(jnp.asarray(X[first_c0]), 3)),
            atol=1e-6)

    def test_out_of_range_raises(self):
        X = np.array([[0.0, 2.0]])
        with pytest.raises(ValueError, match="rescaled"):
            encode_dataset(X, X, np.zeros(1), MPSOptions(verbosity=-1))

    def test_custom_function_basis(self):
        def mybasis(x, d):
            return jnp.stack([jnp.ones_like(x), x, x ** 2], axis=-1)

        spec = function_basis(mybasis, False, (-1.0, 1.0), name="poly")
        X = np.random.default_rng(1).uniform(-1, 1, (4, 5))
        opts = MPSOptions(d=3, encoding="custom", verbosity=-1)
        ds = encode_dataset(X, X, np.zeros(4), opts, spec=spec)
        np.testing.assert_allclose(np.asarray(ds.X_enc)[..., 2],
                                   (X ** 2)[np.argsort(np.zeros(4), kind="stable")],
                                   atol=1e-12)

    def test_custom_basis_nonstandard_range_trains(self, two_class_sines):
        """Regression: preprocessing must scale into a custom spec's declared
        range (here (0, 1)), not the name-derived (-1, 1) default."""
        import mpstime_tpu as mt

        def mybasis(x, d):
            # shifted Legendre: orthonormal on [0, 1]
            return jnp.stack([jnp.ones_like(x),
                              np.sqrt(3.0) * (2 * x - 1),
                              np.sqrt(5.0) * (6 * x ** 2 - 6 * x + 1)],
                             axis=-1)

        spec = function_basis(mybasis, False, (0.0, 1.0), name="poly01")
        Xtr, ytr, Xte, yte = two_class_sines
        opts = MPSOptions(d=3, encoding="custom", nsweeps=3, chi_max=10,
                          verbosity=-1, dtype="float64")
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts, custom_encoding=spec)
        assert trained.opts.custom_encoding_range == (0.0, 1.0)
        acc = np.mean(mt.classify(trained, Xte) == yte)
        assert acc >= 0.8

    def test_encode_series_matches_dataset(self):
        rng = np.random.default_rng(3)
        X = rng.uniform(-1, 1, (5, 7))
        opts = MPSOptions(d=4, verbosity=-1)
        ds = encode_dataset(X, X, np.zeros(5), opts)
        one = encode_series(X[2], opts, ds.enc_args)
        np.testing.assert_allclose(np.asarray(one), np.asarray(ds.X_enc[2]),
                                   atol=1e-12)
