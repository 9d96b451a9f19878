"""Training options for MPSTime-TPU.

TPU-native re-design of the reference's dual-struct options system
(MPSTime.jl src/Structs/options.jl:11-143 ``MPSOptions`` / :154-235 ``Options``).
We keep a single frozen dataclass of plain, serialisable Python types — the
symbol<->object conversion layer the reference needs (options.jl:243-327) is
unnecessary because encodings are looked up by name at use time.

Defaults mirror the reference defaults (options.jl:106-143) exactly, with one
TPU-first difference: ``dtype`` defaults follow the encoding (complex for
Fourier/Stoudenmire/Sahand) at float64 precision only when JAX x64 is enabled;
on TPU the natural choice is float32 and options accept any jnp dtype name.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import numpy as np

# Encodings that produce complex-valued feature vectors
# (reference: basis_structs.jl `iscomplex` flags)
_COMPLEX_ENCODINGS = frozenset({
    "fourier", "stoudenmire", "sahand",
})

_REAL_ENCODINGS = frozenset({
    "legendre", "legendre_no_norm", "legendre_norm", "uniform",
    "sahand_legendre", "sahand_legendre_time_dependent", "sl", "sltd",
    "custom",
})


def canonical_encoding_name(name: str) -> str:
    """Normalise encoding names the same way the reference's ``model_encoding``
    does (options.jl:243-279): lowercase, aliases collapsed."""
    s = name.lower().strip()
    aliases = {
        "legendre": "legendre_no_norm",   # reference maps :Legendre -> legendre_no_norm
        "legendre_no_norm": "legendre_no_norm",
        "legendre_norm": "legendre_norm",
        "stoudenmire": "stoudenmire",
        "fourier": "fourier",
        "sahand": "sahand",
        "sl": "sahand_legendre",
        "sahand_legendre": "sahand_legendre",
        "sahand_legendre_time_independent": "sahand_legendre",
        "sltd": "sahand_legendre_time_dependent",
        "sahand_legendre_time_dependent": "sahand_legendre_time_dependent",
        "uniform": "uniform",
        "custom": "custom",
        "erf": "erf",   # reference placeholder basis (errors at lookup)
    }
    if s in aliases:
        return aliases[s]
    # split bases: "hist_split_<basis>" / "unif_split_<basis>"
    for prefix, canon in (("hist_split_", "hist_split_"), ("histogram_split_", "hist_split_"),
                          ("unif_split_", "unif_split_"), ("uniform_split_", "unif_split_")):
        if s.startswith(prefix):
            return canon + canonical_encoding_name(s[len(prefix):])
    raise ValueError(
        f"Unknown encoding {name!r}. Options: legendre, legendre_norm, fourier, "
        f"stoudenmire, sahand, sahand_legendre (sl), sahand_legendre_time_dependent (sltd), "
        f"uniform, custom, hist_split_<basis>, unif_split_<basis>")


def encoding_is_complex(name: str) -> bool:
    s = canonical_encoding_name(name)
    # split bases inherit from their auxiliary basis
    while s.startswith(("hist_split_", "unif_split_")):
        s = s.split("split_", 1)[1]
    return s in _COMPLEX_ENCODINGS


# Largest chi_max at which the fused warm q=3 split still tracks the complex
# encodings' +-paired degenerate bond spectra.  The r4 chi=64 probe
# (scripts/chi64_probe.py, docs/complex_split_oracle.md section 5) measured
# the fused route out of the exact-SVD band above it (fourier chi=64:
# 0.61-0.69 test acc vs exact 0.76-0.82 over 3 seeds) while the Ritz-rotated
# warm split stays in/above band (0.78-0.85) — so svd_alg="auto" resolves to
# "randomized_warm_ritz" for complex encodings above this gate.
COMPLEX_RITZ_CHI_GATE = 40


@dataclass(frozen=True)
class MPSOptions:
    """Hyperparameters and options for :func:`fit_mps`.

    Field semantics follow the reference (options.jl:11-39); see that file's
    docstrings for extended descriptions.
    """

    # Logging
    verbosity: int = 1
    log_level: int = 3
    track_cost: bool = False

    # MPS training hyperparameters
    nsweeps: int = 10
    chi_max: int = 25
    eta: float = 0.01
    d: int = 5
    cutoff: float = 1e-10
    update_iters: int = 1
    dtype: Optional[str] = None   # None -> inferred from encoding + x64 state
    exit_early: bool = False

    # Encoding
    encoding: str = "legendre_no_norm"
    projected_basis: bool = False
    aux_basis_dim: int = 2
    encode_classes_separately: bool = False

    # Preprocessing & init
    sigmoid_transform: bool = True
    minmax: bool = True
    data_bounds: Tuple[float, float] = (0.0, 1.0)
    init_rng: int = 1234
    chi_init: int = 4

    # Loss / optimiser
    loss_grad: str = "KLD"          # "KLD" | "MSE"
    bbopt: str = "TSGO"             # "TSGO" | "GD"
    rescale: Tuple[bool, bool] = (False, True)
    train_classes_separately: bool = False

    # SVD / truncated-split algorithm:
    #   "auto"            -> CPU: "gram_eigh"; accelerators: "randomized_warm",
    #                        except complex encodings above
    #                        COMPLEX_RITZ_CHI_GATE which resolve to
    #                        "randomized_warm_ritz" (see resolved_svd_alg)
    #   "randomized_warm" -> eigh-free split warm-started from the previous
    #                        sweep's per-bond subspace (fastest TPU path;
    #                        ops/decomp.py warm_split_*)
    #   "randomized"      -> sketched power iteration + Rayleigh-Ritz
    #   "randomized_lean" -> cold eigh-free split (fast, lower quality at
    #                        small chi; see ops/decomp.py)
    #   "gram_eigh"       -> exact eigendecomposition of the small-side Gram
    #   "svd"             -> jnp.linalg.svd (reference-precision fallback)
    #   "randomized_warm_ritz" -> the warm split plus a per-bond [k, k]
    #                        Rayleigh-Ritz rotation: exact-SVD truncation
    #                        ordering on the warm subspace (the large-chi
    #                        complex quality route — in/above the exact band
    #                        at fourier chi=64 where every eigh-free fast
    #                        split is below it, docs/complex_split_oracle.md
    #                        section 5; the eigh keeps it off the fused
    #                        Pallas kernels, so it is slower —
    #                        ops/decomp.warm_ritz_split_*)
    svd_alg: str = "auto"
    # warm routes (randomized_warm / randomized_warm_ritz): refresh the
    # per-bond subspaces (power step + orth) every K-th sweep, splitting
    # against the frozen cached bases in between.  K=1 (default) refreshes
    # every sweep; K=2 cuts the per-bond orthogonalization — the dominant
    # TPU cost once the bond step is fused — out of half the sweeps.  On
    # the RITZ route K>1 skips only the power step: the per-bond [k, k]
    # eigh (that route's dominant cost) still runs every sweep, so K>1
    # saves near-nothing there.  Measured ECG200 chi=64 v5e: real f32 ~0.014 -> 0.0104
    # s/sweep at K=2 (test acc 0.91 -> 0.89).  For COMPLEX encodings K=2
    # is NOT recommended: the r3 "accuracy-neutral" reading was a q=1
    # artifact — under the shipped q=3 default, freezing the now-accurate
    # subspace costs up to 28 test-acc points (docs/complex_split_oracle.md
    # section 6).
    subspace_refresh_every: int = 1
    # warm splits only: power-iteration steps per subspace refresh
    # (per-column normalization between steps).  0 = auto: 1 for real
    # encodings and the ritz route, 3 for complex randomized_warm — the r4
    # exact-split oracle (docs/complex_split_oracle.md) showed one warm
    # power step losing ~9 test-acc points vs the exact band on fourier's
    # +-paired degenerate bond spectra, while q=3 beats exact SVD at
    # chi<=40 on both probed seeds (0.74-0.86 vs 0.68-0.76).  Above
    # COMPLEX_RITZ_CHI_GATE the q=3 subspace stops tracking the spectrum
    # (fourier chi=64: 0.61-0.69 vs exact 0.76-0.82) and auto switches to
    # the Ritz-rotated split, where q=1 already sits in band (0.78-0.85,
    # 3 seeds) and extra powers buy nothing (q=3: 0.77-0.82).  Real
    # encodings measure accuracy-saturated at q=1.
    subspace_power_iters: int = 0
    # Ritz route only (svd_alg="randomized_warm_ritz", incl. the complex
    # auto gate): number of leading sweeps whose per-bond eigen-rotation is
    # an EXACT eigh; later sweeps switch to the eigh-free
    # orthogonal-iteration tracker (ops/decomp._ritz_rot_track), taking
    # the eigh (the route's dominant per-bond TPU cost: 0.42-0.53 of the
    # 0.47-0.56 s/sweep at fourier chi=64 on v5e) off the steady-state
    # critical path.  Default 2: the exact-split oracle measured the
    # tracked schedule IN the exact band (fourier chi=64 f64, 3 seeds:
    # test acc 0.79-0.85 vs exact svd 0.76-0.82; even pure tracking from
    # sweep 0 holds 0.80-0.83 — docs/complex_split_oracle.md section 7).
    # -1 = exact eigh on every sweep (the legacy/bit-parity route).
    ritz_exact_sweeps: int = 2
    # Ritz route rotation implementations (see resolved_ritz_rots):
    #   ritz_rot_exact: "auto" | "eigh" | "eigh_r" | "jacobi" — the
    #     rotation for the first ritz_exact_sweeps sweeps (the cold-start
    #     eigen-ordering phase).  "eigh" = exact complex eigh (XLA bond
    #     path).  "eigh_r" = ONE realified real eigh + complex
    #     re-extraction (ops/decomp._ritz_rot_eigh_realified — ~7.5x
    #     cheaper per bond on TPU, but its cluster-splitting perturbation
    #     measurably costs accuracy on the f64 oracle, so it is opt-in:
    #     scripts/jacobi_oracle.py).  "jacobi" = _JACOBI_WARM_ROUNDS
    #     odd-even Jacobi rounds (matmul-only, runs FUSED on TPU — the
    #     no-eigh-anywhere schedule).
    #   ritz_rot_track: "auto" | "track" | "jacobi" — the tracked sweeps'
    #     rotation.  auto = QR-based orthogonal iteration on CPU,
    #     matmul-only adjacent-pair exact Jacobi on accelerators
    #     (ops/decomp._ritz_rot_jacobi — Mosaic-expressible, so the fused
    #     pair kernels run the whole tracked bond step in-kernel, K12cr).
    ritz_rot_exact: str = "auto"
    ritz_rot_track: str = "auto"
    # Orthogonalization inside the randomized/lean/warm splits:
    #   "auto" -> accelerators: "ns" (including the ritz route — the chi=64
    #             probe measured ritz+NS at 0.82-0.88 test acc over 3 seeds,
    #             at or above both ritz+QR 0.78-0.85 and exact SVD
    #             0.76-0.82, and NS swaps the route's per-bond realified
    #             [2 chi d, 2 chi] Householder QR for matmuls); CPU: "qr"
    #   "qr"   -> thin Householder QR (complex via the realified embedding,
    #             ops/decomp._qr_orth)
    #   "ns"   -> matmul-only Newton-Schulz polar iteration
    #             (ops/decomp.ns_orth).  Spans the same subspace as QR (the
    #             MPS gauge freedom absorbs the basis difference); being
    #             matmul-only it runs INSIDE the fused Pallas bond kernels,
    #             collapsing the per-bond K1 -> XLA-QR -> K2 dispatch
    #             sequence to two kernels, and on complex inputs it is
    #             structure-preserving by construction (no Householder
    #             fill-in hazard on rank-deficient subspaces).
    orth_alg: str = "auto"

    # Domain of a custom encoding (encoding="custom"): fit_mps stamps the
    # EncodingSpec's range here so preprocessing scales into the right
    # interval (closed-form encodings derive it from the name instead).
    custom_encoding_range: Optional[Tuple[float, float]] = None

    # Shape-polymorphic padding (chi_cap, d_cap): run training/inference at
    # these PADDED static shapes — encodings zero-padded from d to d_cap,
    # cores allocated at chi_cap with chi_max applied as a *runtime*
    # truncation-rank cap.  Zero-padding is exact (padded directions carry
    # no energy, the cutoff mask ignores them), so results match the
    # unpadded run up to degenerate-eigenbasis noise while every
    # (chi_max, d) <= (chi_cap, d_cap) shares ONE compiled program.  This is
    # how ``tune`` avoids paying a fresh XLA compile per hyperparameter
    # trial.  None (default) = exact shapes.
    pad_to: Optional[Tuple[int, int]] = None

    # Debug
    return_encoding_meta_info: bool = False

    def __post_init__(self):
        object.__setattr__(self, "encoding", canonical_encoding_name(self.encoding))
        if self.loss_grad.upper() not in ("KLD", "MSE", "MIXED"):
            raise ValueError(f"loss_grad must be 'KLD', 'MSE' or 'Mixed', "
                             f"got {self.loss_grad!r}")
        object.__setattr__(self, "loss_grad", self.loss_grad.upper())
        bb = self.bbopt.upper()
        if bb in ("GD", "CUSTOMGD"):
            bb = "GD"
        elif bb in ("TSGO", "CGD"):
            pass
        elif bb in ("OPTIM", "OPTIMKIT"):
            # DIVERGENCE NOTE: the reference's Optim/OptimKit bbopt runs a
            # conjugate-gradient bond optimizer WITH a line search per
            # update (legacy engine only —
            # /root/reference/src/legacy_itensor/loss_functions.jl:172-270;
            # the modern reference engine ERRORS on these options,
            # loss_functions.jl:120-151).  Our "CGD" is Polak-Ribière
            # momentum with the TSGO normalized fixed step
            # (ops/bond_update.py apply_update, bbopt="CGD") — same descent family, no
            # line search.  Accepting OPTIM/OPTIMKIT here maps them to the
            # closest working algorithm rather than replicating the
            # reference's error; fits needing exact parity should compare
            # against GD/TSGO, which match the reference exactly.
            bb = "CGD"
        else:
            raise ValueError(f"bbopt must be 'GD', 'TSGO' or 'CGD', "
                             f"got {self.bbopt!r}")
        object.__setattr__(self, "bbopt", bb)
        if self.orth_alg not in ("auto", "qr", "ns"):
            raise ValueError(f"orth_alg must be 'auto', 'qr' or 'ns', "
                             f"got {self.orth_alg!r}")
        if self.ritz_rot_exact not in ("auto", "eigh", "eigh_r", "jacobi"):
            raise ValueError(f"ritz_rot_exact must be 'auto', 'eigh', "
                             f"'eigh_r' or 'jacobi', got "
                             f"{self.ritz_rot_exact!r}")
        if self.ritz_rot_track not in ("auto", "track", "jacobi"):
            raise ValueError(f"ritz_rot_track must be 'auto', 'track' or "
                             f"'jacobi', got {self.ritz_rot_track!r}")
        if isinstance(self.rescale, list):
            object.__setattr__(self, "rescale", tuple(self.rescale))
        if isinstance(self.data_bounds, list):
            object.__setattr__(self, "data_bounds", tuple(self.data_bounds))
        if isinstance(self.custom_encoding_range, list):
            object.__setattr__(self, "custom_encoding_range",
                               tuple(self.custom_encoding_range))
        if self.pad_to is not None:
            pt = tuple(int(v) for v in self.pad_to)
            if len(pt) != 2:
                raise ValueError("pad_to must be (chi_cap, d_cap)")
            if pt[0] < self.chi_max or pt[1] < self.d:
                raise ValueError(
                    f"pad_to {pt} must dominate (chi_max, d) = "
                    f"({self.chi_max}, {self.d})")
            object.__setattr__(self, "pad_to", pt)

    # ---- dtype resolution -------------------------------------------------
    def resolved_dtype(self) -> np.dtype:
        """Resolve dtype: explicit option wins, else complex iff the encoding is
        complex, at the widest precision JAX currently allows."""
        import jax

        if self.dtype is not None:
            return np.dtype(self.dtype)
        x64 = jax.config.read("jax_enable_x64")
        if encoding_is_complex(self.encoding):
            return np.dtype(np.complex128 if x64 else np.complex64)
        return np.dtype(np.float64 if x64 else np.float32)

    def real_dtype(self) -> np.dtype:
        dt = self.resolved_dtype()
        return np.dtype(np.zeros(0, dt).real.dtype)

    def resolved_svd_alg(self) -> str:
        if self.svd_alg != "auto":
            return self.svd_alg
        import jax
        if jax.default_backend() == "cpu":
            return "gram_eigh"
        # Warm-started eigh-free splits are the accelerator default: at a
        # fourier c64 chi=64 sweep the fused kernels run ~0.03 s vs ~0.68 s
        # for a per-bond-eigh route (the complex [k,k] eigh lowers to a
        # slow TPU kernel).  Complex encodings run 3 warm power steps per
        # refresh (resolved_power_iters, docs/complex_split_oracle.md) —
        # but above COMPLEX_RITZ_CHI_GATE the q=3 subspace stops tracking
        # the +-paired degenerate spectra (fourier chi=64: 0.61-0.69 test
        # acc vs exact 0.76-0.82) and quality takes priority: auto switches
        # to the Ritz-rotated warm split, which recovers exact-SVD
        # truncation ordering and sits in/above the exact band (0.78-0.85
        # over 3 seeds).  Hyperopt note: a search whose chi grid straddles
        # the gate compiles two trial programs (one per resolved alg) —
        # pin svd_alg explicitly to keep a single compile class.
        if (encoding_is_complex(self.encoding)
                and self.chi_max > COMPLEX_RITZ_CHI_GATE):
            return "randomized_warm_ritz"
        return "randomized_warm"

    def resolved_orth_alg(self) -> str:
        """Split-orthogonalization algorithm: explicit value wins; auto
        resolves to the matmul-only Newton-Schulz polar route on
        accelerators (it fuses into the Pallas bond kernels, and on the
        XLA-path ritz route it replaces the per-bond realified
        [2 chi d, 2 chi] Householder QR — slow on TPU — with matmuls; the
        chi=64 probe measured ritz+NS in/above the exact band at 0.82-0.88
        over 3 seeds, docs/complex_split_oracle.md section 5) and thin QR
        on CPU (LAPACK QR is cheap there and NS's fixed iteration count
        buys nothing — ritz+NS measured ~2.7x slower than ritz+QR on
        CPU).

        EXCEPTION 1: shape-polymorphic padded runs (``pad_to`` set) resolve
        to "qr" on every backend.  A padded trial's runtime chi cap leaves
        most of the static-``keep``-wide warm subspace structurally dead,
        and the NS subspace iteration contaminates the kept basis there:
        per-column normalization + the eps revival re-inflate dead
        directions into junk that the polar step (which mixes columns,
        unlike QR's nested fill-in) folds into the live ones.  Measured
        (ECG200 f32 warm, pad_to=(40, 8), chi cap 17, 4 sweeps): train acc
        ns 0.69 vs qr 0.98 on CPU, ns 0.73 on-chip vs the 0.85 lane floor.

        EXCEPTION 2: the ritz route (resolved svd_alg
        "randomized_warm_ritz") resolves to "qr" on every backend.  Its
        shipped exact->track schedule (``ritz_exact_sweeps=2``) hands the
        warm basis to the eigh-free orthogonal-iteration tracker, and in
        f32 on chip the NS-refreshed basis drifts enough that the tracker
        maintains a polluted eigen-ordering: measured fourier c64 chi=64
        ECG200 v5e train acc 0.59-0.75 (ns, seeds 1234/777) vs 0.90-0.95
        (qr) at a ~6% sweep-time cost (0.182 vs 0.169 s at res=2; pure
        tracking 0.068 vs 0.049 — scripts/ritz_tpu_probe.py ritz_track*
        cells).  On the f64 CPU oracle both chains are in band (section 7
        of docs/complex_split_oracle.md); the rule pins the chain that is
        robust at hardware precision.  Explicit orth_alg="ns" is still
        honored for experiments."""
        if self.orth_alg != "auto":
            return self.orth_alg
        if self.pad_to is not None:
            return "qr"
        if self.resolved_svd_alg() == "randomized_warm_ritz":
            return "qr"
        import jax
        return "qr" if jax.default_backend() == "cpu" else "ns"

    def resolved_ritz_rots(self) -> Tuple[str, str]:
        """(exact_rot, track_rot) for the ritz exact->track schedule, as
        the sweep engine's rot strings (option value "jacobi" for the
        exact phase maps to "jacobi_warm" — _JACOBI_WARM_ROUNDS of
        odd-even rotations instead of an eigh).

        Auto policy: CPU keeps the r4 pair ("eigh", "track") — LAPACK's
        complex eigh is cheap there and the orthogonal-iteration tracker
        is the long-validated chain; accelerators use ("eigh",
        "jacobi") — the tracked sweeps run the matmul-only Jacobi tracker
        INSIDE the fused pair kernels (K12cr) while the exact sweeps keep
        the complex eigh (the f64 oracle put eigh+jacobi in the exact
        band, 0.77-0.81, and showed the cheaper eigh_r exact rotation
        costs accuracy — scripts/jacobi_oracle.py)."""
        import jax
        cpu = jax.default_backend() == "cpu"
        exact = (self.ritz_rot_exact if self.ritz_rot_exact != "auto"
                 else "eigh")
        track = (self.ritz_rot_track if self.ritz_rot_track != "auto"
                 else ("track" if cpu else "jacobi"))
        if exact == "jacobi":
            exact = "jacobi_warm"
        return exact, track

    def resolved_power_iters(self) -> int:
        """Warm-split power steps per refresh: explicit value wins; auto (0)
        resolves to 3 for complex encodings on the plain warm split, and 1
        for real encodings and the ritz route (the Ritz rotation supersedes
        the +--pair disambiguation the extra powers bought: q=1 measures in
        band at fourier chi=64, q=3 the same but slower — see the field
        comment and docs/complex_split_oracle.md)."""
        if self.subspace_power_iters > 0:
            return int(self.subspace_power_iters)
        if not encoding_is_complex(self.encoding):
            return 1
        return 1 if self.resolved_svd_alg() == "randomized_warm_ritz" else 3

    # ---- convenience ------------------------------------------------------
    def replace(self, **kwargs) -> "MPSOptions":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_dict(cls, d: dict) -> "MPSOptions":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_json(cls, s: str) -> "MPSOptions":
        return cls.from_dict(json.loads(s))


def print_opts(opts: MPSOptions, long: bool = False, file=None) -> None:
    """Print options as a table (reference: summary.jl:438-456)."""
    if long:
        names = [f.name for f in dataclasses.fields(opts)]
    else:
        names = ["chi_max", "d", "eta", "nsweeps", "encoding",
                 "sigmoid_transform", "loss_grad"]
    width = max(len(n) for n in names)
    print("┌" + "─" * (width + 2) + "┬" + "─" * 30 + "┐", file=file)
    for n in names:
        print(f"│ {n:<{width}} │ {getattr(opts, n)!s:<28} │", file=file)
    print("└" + "─" * (width + 2) + "┴" + "─" * 30 + "┘", file=file)
