"""Per-stage roofline accounting for the headline bench (VERDICT r3 #6).

For each pipeline stage, estimate the three resources it can be bound by —
MXU/VPU FLOPs, HBM bytes, and tunnel-wire bytes — from the workload's
shapes and the Config's kernel rules, then relate the measured stage time
to each peak.  The point is not 3-digit precision; it is exposing WHICH
roof each stage sits under so the next optimization target is chosen from
data (e.g. the blend is wire-download-bound at <1% of HBM peak, so a
faster gather would not move it).

Chip peaks: TPU v5e (the bench device, `v5e:1x1x1` in the compile log) —
197 TFLOP/s bf16 / ~49 TFLOP/s f32 on the MXU, 819 GB/s HBM.  The tunnel
wire is measured at ~45-60 MB/s flat (openpano_tpu/io/wirecodec.py); its
minute-to-minute swings are why `wire_mbs` is a parameter.
"""

from __future__ import annotations

import math

V5E_PEAK_F32 = 49e12       # MXU f32-equivalent FLOP/s
V5E_PEAK_HBM = 819e9       # bytes/s
WIRE_BPS_DEFAULT = 50e6    # tunnel host<->device, measured r4


def _blur_window(sigma: float, gwf: int) -> int:
    # ops/gaussian.py kernel rule (config.py): ceil(0.3*(sigma/2-1)+0.8)*GWF
    k = int(math.ceil((0.3 * (sigma / 2.0 - 1.0) + 0.8) * gwf))
    return max(k | 1, 3)


def feature_stage(n: int, w: int, h: int, cfg) -> dict:
    """SIFT feature stage: codec'd grey upload + resize + pyramid +
    window kernels."""
    from openpano_tpu.ops.imgproc import working_size

    wh_, ww_ = working_size(w, h, cfg.SIFT_WORKING_SIZE)
    flops = 0.0
    hbm = 0.0
    # full->working grey resize: 4-tap gather + lerp per output px
    px0 = wh_ * ww_
    flops += n * px0 * 10
    hbm += n * (px0 * 4 * 4 + px0 * 4)
    # pyramid: per octave o (area / 2^o), per scale j: separable blur
    area = px0
    for o in range(cfg.NUM_OCTAVE):
        sigma = cfg.GAUSS_SIGMA
        for j in range(1, cfg.NUM_SCALE):
            win = _blur_window(sigma, cfg.GAUSS_WINDOW_FACTOR)
            flops += n * area * (2 * win * 2)          # col+row MAC
            hbm += n * area * 8 * 2                    # rd+wr, 2 passes
            # mag/ort (grad + atan2) + DoG |a-b|
            flops += n * area * 35
            hbm += n * area * 4 * 4
            sigma *= cfg.SCALE_FACTOR
        area /= 2.0
    # extrema + window kernels (orientation/descriptor histograms):
    # measured ~15% of the pyramid's arithmetic on the headline profile
    flops *= 1.15
    # wire: grey 4-bit codec + 2-bit residual (stitcherbase docs)
    wire = n * h * w * (0.5 + 0.25) * 1.05  # +exceptions
    return {"flops": flops, "hbm_bytes": hbm, "wire_bytes": wire}


def match_stage(n_pairs: int, K: int, desc_len: int) -> dict:
    """2-NN distance matmuls over candidate pairs (MXU)."""
    flops = n_pairs * 2.0 * K * K * desc_len
    hbm = n_pairs * (2 * K * desc_len * 4 + K * K * 4)
    return {"flops": flops, "hbm_bytes": hbm, "wire_bytes": 2e6}


def blend_stage(canvas_w: int, canvas_h: int, layers: float = 2.0) -> dict:
    """Linear blend: bilinear gathers per canvas px + u8 download."""
    px = canvas_w * canvas_h
    flops = px * layers * 25
    hbm = px * layers * (4 * 3 * 4 + 12)   # 4-tap RGB gather + write
    # download codec (r5, render._strip_planes_u8 + io.wirecodec.CodedFetch):
    # 4 planes (G, R-G, B-G, A) at 4-bit deltas = 2 B/px packed, plus the
    # 2% inline exception prefix (4 B each) = ~2.33 B/px on the wire
    wire = px * (4 * 0.5 + 0.02 * 4 * 4)
    return {"flops": flops, "hbm_bytes": hbm, "wire_bytes": wire}


def relate(est: dict, seconds: float, wire_bps: float = WIRE_BPS_DEFAULT) -> dict:
    """Attach %-of-peak numbers and the implied binding resource."""
    if seconds <= 0:
        return dict(est)
    out = dict(est)
    out["pct_peak_flops"] = round(100 * est["flops"] / seconds / V5E_PEAK_F32, 2)
    out["pct_peak_hbm"] = round(100 * est["hbm_bytes"] / seconds / V5E_PEAK_HBM, 2)
    out["pct_peak_wire"] = round(100 * est["wire_bytes"] / seconds / wire_bps, 1)
    ideal = {
        "flops": est["flops"] / V5E_PEAK_F32,
        "hbm": est["hbm_bytes"] / V5E_PEAK_HBM,
        "wire": est["wire_bytes"] / wire_bps,
    }
    out["bound"] = max(ideal, key=ideal.get)
    out["ideal_s"] = round(sum(ideal.values()), 4)
    for k in ("flops", "hbm_bytes", "wire_bytes"):
        out[k] = float(f"{est[k]:.3g}")
    return out
