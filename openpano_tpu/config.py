"""Typed configuration for the TPU-native panorama engine.

Mirrors the knob surface of the reference engine's ``config.cfg``
(reference: lib/config.hh:24-86, src/config.cfg:1-69) so tuned behavior
carries over, plus TPU-specific capacity knobs (fixed-shape padding caps)
that have no reference analog.  The same whitespace key-value file format
is accepted by :func:`Config.from_file` (reference: lib/config.cc:13-35).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass


@dataclass(frozen=True)
class Config:
    # ---- modes (reference: config.cfg:1-5); mutually exclusive ----
    CYLINDER: bool = False
    ESTIMATE_CAMERA: bool = True
    TRANS: bool = False

    ORDERED_INPUT: bool = False
    CROP: bool = True
    MAX_OUTPUT_SIZE: int = 8000
    LAZY_READ: bool = True  # accepted for config-file parity; memory strategy differs on TPU

    FOCAL_LENGTH: float = 37.0  # 35mm-equivalent focal, CYLINDER mode

    # ---- keypoint / scale-space (reference: config.cfg:17-37) ----
    SIFT_WORKING_SIZE: int = 800
    NUM_OCTAVE: int = 4
    NUM_SCALE: int = 7
    SCALE_FACTOR: float = 1.4142135623
    GAUSS_SIGMA: float = 1.4142135623
    GAUSS_WINDOW_FACTOR: int = 6
    CONTRAST_THRES: float = 4e-2
    JUDGE_EXTREMA_DIFF_THRES: float = 2e-3
    EDGE_RATIO: float = 6.0
    PRE_COLOR_THRES: float = 5e-2
    CALC_OFFSET_DEPTH: int = 4
    OFFSET_THRES: float = 0.5

    # ---- descriptor & matching (reference: config.cfg:40-56) ----
    ORI_RADIUS: float = 4.5
    ORI_HIST_SMOOTH_COUNT: int = 2
    DESC_HIST_SCALE_FACTOR: float = 3.0
    DESC_INT_FACTOR: float = 512.0
    MATCH_REJECT_NEXT_RATIO: float = 0.8
    RANSAC_ITERATIONS: int = 1500
    RANSAC_INLIER_THRES: float = 3.5
    INLIER_IN_MATCH_RATIO: float = 0.1
    INLIER_IN_POINTS_RATIO: float = 0.04

    # ---- optimization (reference: config.cfg:59-66) ----
    STRAIGHTEN: bool = True
    SLOPE_PLAIN: float = 8e-3
    LM_LAMBDA: float = 5.0
    MULTIPASS_BA: int = 1

    # ---- blending (reference: config.cfg:69) ----
    MULTIBAND: int = 0

    # ---- compile-time constants of the reference (lib/config.hh:72-85) ----
    ORI_WINDOW_FACTOR: float = 1.5
    ORI_HIST_BIN_NUM: int = 36
    ORI_HIST_PEAK_RATIO: float = 0.8
    DESC_HIST_WIDTH: int = 4
    DESC_HIST_BIN_NUM: int = 8

    # ---- TPU-native capacity knobs (no reference analog): fixed-shape caps ----
    # Per-octave cap on raw extrema candidates entering sub-pixel refinement.
    MAX_CAND_PER_OCTAVE: int = 4096
    # Per-octave cap on refined keypoints (before orientation duplication).
    MAX_KP_PER_OCTAVE: int = 2048
    # Max orientations emitted per keypoint (reference emits all peaks >=
    # 0.8*max; >3 peaks is vanishingly rare).
    MAX_ORI_PER_KP: int = 3
    # Per-octave cap on oriented/described keypoints.
    MAX_DESC_PER_OCTAVE: int = 2048
    # Final cap on keypoints per image (compacted across octaves).
    MAX_KP_PER_IMAGE: int = 4096
    # Cap on (ratio+mutual tested) matches kept per image pair.
    MAX_MATCHES_PER_PAIR: int = 1024
    # Grid resolution for the overlap-area estimate (replaces the reference's
    # sampled convex hull + shoelace area, transform_estimate.cc:204-208).
    OVERLAP_AREA_GRID: int = 64
    # RANSAC hypothesis batch is vmapped; dtype for the DLT solves.
    RANSAC_DTYPE: str = "float32"
    BA_DTYPE: str = "float64"
    # Run bundle adjustment on the host CPU backend: the LM state is tiny
    # (6 params x <=hundreds of cameras) and f64 is native there, while TPU
    # f64 is software-emulated with a heavy compile.  The device path stays
    # available for the distributed large-scale BA (set False).
    BA_ON_HOST: bool = True
    # Mode-seeking initial-focal estimate instead of the reference's plain
    # median over per-pair closed-form extractions (camera.cc:69-87).  The
    # extraction is bimodal under noise on narrow-step panoramas and the
    # contaminated median seeds BA in the wrong basin (see
    # camera.estimate_focal_robust).  Set False for bit-faithful reference
    # behavior.
    ROBUST_FOCAL: bool = True
    # Adaptive Marquardt lambda scheduling (accept /3, reject x4) instead
    # of the reference's fixed lambda (incremental_bundle_adjuster.cc:
    # 240-248).  Default ON since r5: combined with short subsampled
    # intermediate passes it dominates the fixed schedule on BOTH axes —
    # headline sweep (tools/sweep_ba_r5.py): fixed-lambda best point was
    # 1.33 s / 1.09 px; adaptive + 1-slot intermediates + 9-iter caps
    # reaches 0.55 s / 0.61 px.  Set False for bit-faithful reference
    # lambda behavior.
    BA_ADAPTIVE_LM: bool = True
    # Iteration cap for the INTERMEDIATE incremental-BA runs (the
    # per-image/per-connection passes of MULTIPASS_BA, whose only job is
    # keeping the next camera initialization healthy); a final run always
    # polishes at the full LM_MAX_ITER=100 depth.  The reference runs every
    # pass to 100 (incremental_bundle_adjuster.cc:24) — set 100 to match.
    # r4 sweeps (fixed lambda, full points, patience 1): 8 -> 2.2 px,
    # 15 -> 1.69, 20 -> 1.09, 25 -> 0.99.  r5 changed the regime: with
    # BA_ADAPTIVE_LM + 1-slot subsampled intermediates, 9 iterations
    # land 0.61 px at 0.55 s (tools/sweep_ba_r5.py cap1_it9_adapt) —
    # adaptive damping extracts more progress per iteration, so short
    # passes suffice.  Raise toward 20-25 if BA_ADAPTIVE_LM is off.
    BA_INTERMEDIATE_ITERS: int = 9
    # Plateau patience (consecutive non-improving LM steps before stopping)
    # for the INTERMEDIATE passes only; the final polish uses the
    # reference's 5 (incremental_bundle_adjuster.cc:159).  Intermediate
    # passes exist to keep initializations healthy, not to converge —
    # waiting out 5 rejected steps x ~37 passes is pure latency.
    BA_INTERMEDIATE_PATIENCE: int = 1
    # Point budget for INTERMEDIATE passes, in 32-point slots per pair
    # (0 = full set).  Intermediates only keep the next initialization
    # healthy, so they run on a strided inlier subsample; the final
    # polish always uses every point.  r5 sweep (tools/sweep_ba_r5.py,
    # 38-image headline): cap 1 alone drifts (1.74 px) but cap 1 +
    # BA_ADAPTIVE_LM lands 0.61 px at 0.55 s — adaptive damping tames
    # the subsampled steps and the full-point final polish finishes the
    # convergence.  Cap 2 is the conservative fallback (1.05-1.11 px
    # without adaptive).
    BA_INTERMEDIATE_POINT_SLOTS: int = 1
    # Relative acceptance tolerance for INTERMEDIATE passes: a step must
    # improve RMS by max(1e-3 px, rel_tol * current) to count.  0 keeps
    # the reference's absolute 1e-3 px rule for every pass.  MEASURED to
    # trade accuracy for little time on the headline (0.003 -> 2.18 px
    # from 1.69); kept as an opt-in latency knob, default off.
    BA_INTERMEDIATE_REL_TOL: float = 0.0
    # Final-polish LM budget (the full-depth run after the incremental
    # schedule).  Defaults match the reference (100 iters, patience 5,
    # incremental_bundle_adjuster.cc:24,159).
    BA_FINAL_MAX_ITER: int = 100
    BA_FINAL_PATIENCE: int = 5
    # At MULTIPASS_BA=1, run the intermediate BA once per this many ADDED
    # images instead of after every single one (the reference's cadence,
    # camera_estimator.cc:74-91, equals 1).  MEASURED to hurt
    # (tools/ba_sweep.py, 38-image headline): batch=2 degrades 1.69 ->
    # 2.51 px mean reprojection and batch=4 diverges outright (386 px) —
    # a camera initialized from a parent whose own estimate hasn't been
    # refined since several adds compounds drift beyond the LM basin.
    # Kept as an opt-in speed knob for easy workloads; default 1
    # (reference cadence).  The same sweep killed the OPENPANO_BA_NE_F32
    # idea: f32 normal equations diverge (JtJ entries ~1e10 cancel badly).
    BA_BATCH_IMAGES: int = 1
    # Stream the u8 linear blend as column-band groups whose finalized
    # strips download (copy_to_host_async) while later bands compute.
    # On the tunneled TPU the download overlap wins ~0.5 s on the headline
    # 38-image blend and makes the stage robust to transport-bandwidth
    # swings (tools/bench_transfer.py); on for the u8 output path.
    STREAM_BLEND: bool = True

    @property
    def DESC_LEN(self) -> int:
        return self.DESC_HIST_WIDTH * self.DESC_HIST_WIDTH * self.DESC_HIST_BIN_NUM

    def validate(self) -> "Config":
        if int(self.CYLINDER) + int(self.ESTIMATE_CAMERA) + int(self.TRANS) > 1:
            raise ValueError("CYLINDER/ESTIMATE_CAMERA/TRANS are mutually exclusive")
        if self.CYLINDER and not self.ORDERED_INPUT:
            raise ValueError("CYLINDER mode requires ORDERED_INPUT")
        return self

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # knobs the reference's init_config() reads with the fatal CFG() macro
    # (main.cc:237-292); a config file missing any of these aborts there
    # (lib/config.cc:31-35), so we match — minus LAZY_READ, which is an
    # accepted-but-optional field here (the batched TPU memory model has
    # its own strategy; see Config.LAZY_READ).
    REFERENCE_KNOBS = (
        "CYLINDER", "TRANS", "ESTIMATE_CAMERA", "ORDERED_INPUT", "CROP",
        "STRAIGHTEN", "FOCAL_LENGTH", "MAX_OUTPUT_SIZE", "SIFT_WORKING_SIZE",
        "NUM_OCTAVE", "NUM_SCALE", "SCALE_FACTOR", "GAUSS_SIGMA",
        "GAUSS_WINDOW_FACTOR", "JUDGE_EXTREMA_DIFF_THRES", "CONTRAST_THRES",
        "PRE_COLOR_THRES", "EDGE_RATIO", "CALC_OFFSET_DEPTH", "OFFSET_THRES",
        "ORI_RADIUS", "ORI_HIST_SMOOTH_COUNT", "DESC_HIST_SCALE_FACTOR",
        "DESC_INT_FACTOR", "MATCH_REJECT_NEXT_RATIO", "RANSAC_ITERATIONS",
        "RANSAC_INLIER_THRES", "INLIER_IN_MATCH_RATIO",
        "INLIER_IN_POINTS_RATIO", "SLOPE_PLAIN", "LM_LAMBDA", "MULTIPASS_BA",
        "MULTIBAND",
    )

    @classmethod
    def from_file(cls, path: str, strict: bool = True, **overrides) -> "Config":
        """Parse the reference's config file format: whitespace-separated
        key value pairs, '#' comments, every value numeric
        (reference: lib/config.cc:13-29).

        strict=True matches the reference's fatal missing-key behavior
        (config.cc:31-35): every REFERENCE_KNOBS entry must appear in the
        file (or in ``overrides``).  Unknown file keys warn (the reference
        silently never reads them)."""
        import warnings

        values = {}
        field_map = {f.name: f for f in dataclasses.fields(cls)}
        with open(path) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                parts = line.split()
                if len(parts) < 2:
                    continue
                key, val = parts[0], float(parts[1])
                if key not in field_map:
                    warnings.warn(f"config {path}: unknown key {key!r}")
                    continue
                ftype = field_map[key].type
                if ftype in ("bool", bool):
                    values[key] = bool(val)
                elif ftype in ("int", int):
                    values[key] = int(val)
                else:
                    values[key] = float(val)
        values.update(overrides)
        if strict:
            missing = [k for k in cls.REFERENCE_KNOBS if k not in values]
            if missing:
                raise KeyError(
                    f"Option {missing[0]} not found in config file {path}!"
                )  # lib/config.cc:31-35
        return cls(**values).validate()


DEFAULT = Config()


def gauss_window_radius(sigma: float, window_factor: int) -> int:
    """Kernel half-width for a given sigma; the full width is forced odd
    (reference: feature/gaussian.cc:22-24)."""
    kw = int(math.ceil(0.3 * (sigma / 2.0 - 1.0) + 0.8) * window_factor)
    if kw % 2 == 0:
        kw += 1
    return kw // 2
