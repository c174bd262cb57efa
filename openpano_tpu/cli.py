"""Command-line interface.

Reference: src/main.cc — default mode stitches the given images (work(),
main.cc:205-235); debug subcommands visualize individual pipeline stages
(keypoint/orientation/match/inlier/warp/planet, main.cc:41-202,294-331) and
write images under log/.  Config is read from ``config.cfg`` in the CWD (or
--config), same file format (init_config, main.cc:237-292).

Usage:
  python -m openpano_tpu.cli img1.jpg img2.jpg ... [-o out.jpg]
  python -m openpano_tpu.cli --mode keypoint img.jpg
  python -m openpano_tpu.cli --mode match img1.jpg img2.jpg
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .config import Config


def load_config(path: str | None) -> Config:
    if path and os.path.exists(path):
        return Config.from_file(path)
    if path:
        raise SystemExit(f"Cannot find config file {path}")
    if os.path.exists("config.cfg"):
        return Config.from_file("config.cfg")
    return Config()


def _detect(img, cfg):
    import jax.numpy as jnp

    from .stitch.stitcherbase import compute_features

    return compute_features(jnp.asarray(img)[None], cfg)


def _logpath(name: str) -> str:
    os.makedirs("log", exist_ok=True)
    return os.path.join("log", name)


def mode_keypoint(args, cfg):
    from .io import read_img, write_rgb
    from .utils.draw import PlaneDrawer

    img = read_img(args.images[0])
    feats = _detect(img, cfg)
    pos = np.asarray(feats.pos[0])[np.asarray(feats.valid[0])]
    print(f"Found {len(pos)} keypoints")
    pld = PlaneDrawer(img.copy())
    h, w = img.shape[:2]
    for x, y in pos:
        pld.cross(x + w / 2, y + h / 2, 3)
    out = _logpath("keypoint.jpg")
    write_rgb(out, pld.img)
    print(f"Wrote {out}")


def _working(img, cfg):
    """Resize to SIFT working size (feature.cc:31-36)."""
    import jax.numpy as jnp

    from .ops.imgproc import resize, working_size

    h, w = img.shape[:2]
    wh, ww = working_size(w, h, cfg.SIFT_WORKING_SIZE)
    return np.asarray(resize(jnp.asarray(img), wh, ww))


def mode_raw_extrema(args, cfg):
    """Draw unrefined DoG extrema candidates (test_extrema mode 0,
    main.cc:41-58 / ExtremaDetector::get_raw_extrema)."""
    import jax.numpy as jnp

    from .io import read_img, write_rgb
    from .ops.imgproc import rgb2grey
    from .sift.extrema import _candidate_mask
    from .sift.pyramid import build_scale_space
    from .utils.draw import PlaneDrawer

    img = read_img(args.images[0])
    work = _working(img, cfg)
    octaves = build_scale_space(jnp.asarray(work), cfg)
    h, w = img.shape[:2]
    pld = PlaneDrawer(img.copy())
    total = 0
    for octave in octaves:
        mask = np.asarray(_candidate_mask(octave.dog, cfg))
        oh, ow = mask.shape[1], mask.shape[2]
        ss, yy, xx = np.nonzero(mask)
        total += len(ss)
        for y, x in zip(yy, xx):
            pld.cross(x / ow * w, y / oh * h, 3)
    print(f"Raw extrema: {total}")
    out = _logpath("extrema.jpg")
    write_rgb(out, pld.img)
    print(f"Wrote {out}")


def mode_orientation(args, cfg):
    """Draw oriented keypoints as arrows (test_orientation, main.cc:65-82)."""
    import jax.numpy as jnp

    from .io import read_img, write_rgb
    from .sift.detector import octave_caps
    from .sift.extrema import detect_extrema
    from .sift.orientation import assign_orientation
    from .sift.pyramid import build_scale_space
    from .utils.draw import PlaneDrawer

    img = read_img(args.images[0])
    work = _working(img, cfg)
    octaves = build_scale_space(jnp.asarray(work), cfg)
    h, w = img.shape[:2]
    pld = PlaneDrawer(img.copy())
    rng = np.random.default_rng(0)
    total = 0
    for oi, octave in enumerate(octaves):
        caps = octave_caps(cfg, oi)
        raw = detect_extrema(octave, cfg, cap_cand=caps[0], cap_kp=caps[1])
        ori = assign_orientation(raw, octave, cfg, cap=caps[2])
        keep = np.asarray(ori.valid)
        xs = np.asarray(ori.real_x)[keep] * w
        ys = np.asarray(ori.real_y)[keep] * h
        dirs = np.asarray(ori.dir)[keep]
        total += len(xs)
        for x, y, d in zip(xs, ys, dirs):
            pld.set_rand_color(rng)
            pld.arrow(x, y, d, 7)
    print(f"FeaturePoint size: {total}")
    out = _logpath("orientation.jpg")
    write_rgb(out, pld.img)
    print(f"Wrote {out}")


def mode_match(args, cfg, draw_inliers=False):
    import jax
    import jax.numpy as jnp

    from .geometry.ransac import estimate_transform
    from .io import read_img, write_rgb
    from .match.matcher import match_pair
    from .ops.imgproc import hconcat
    from .utils.draw import PlaneDrawer

    img1 = read_img(args.images[0])
    img2 = read_img(args.images[1])
    f1 = _detect(img1, cfg)
    f2 = _detect(img2, cfg)
    res = match_pair(f1.desc[0], f1.valid[0], f2.desc[0], f2.valid[0], cfg)
    print(f"Match size: {int(res.count)}")

    canvas = hconcat([img1, img2])
    pld = PlaneDrawer(canvas)
    rng = np.random.default_rng(0)
    h1, w1 = img1.shape[:2]
    h2, w2 = img2.shape[:2]

    if draw_inliers:
        whs = jnp.asarray([[w1, h1], [w2, h2]], jnp.float32)
        info = estimate_transform(
            res, f1.pos[0], f1.valid[0], f2.pos[0], f2.valid[0],
            whs[0], whs[1], jax.random.PRNGKey(0), cfg, affine=cfg.TRANS,
        )
        print(f"Confidence: {float(info.confidence):.3f}, inliers: {int(info.count)}")
        pts1 = np.asarray(info.to_pos)[np.asarray(info.valid)]
        pts2 = np.asarray(info.from_pos)[np.asarray(info.valid)]
    else:
        idx = np.asarray(res.idx)[np.asarray(res.valid)]
        pts1 = np.asarray(f1.pos[0])[idx[:, 0]]
        pts2 = np.asarray(f2.pos[0])[idx[:, 1]]

    for (x1, y1), (x2, y2) in zip(pts1, pts2):
        pld.set_rand_color(rng)
        a = (x1 + w1 / 2, y1 + h1 / 2)
        b = (x2 + w2 / 2 + w1, y2 + h2 / 2)
        pld.circle(*a, 4)
        pld.circle(*b, 4)
        pld.line(*a, *b)
    out = _logpath("inlier.jpg" if draw_inliers else "match.jpg")
    write_rgb(out, pld.img)
    print(f"Wrote {out}")


def mode_warp(args, cfg):
    import jax.numpy as jnp

    from .io import read_img, write_rgb
    from .stitch.warp import make_projector, warp_image

    img = read_img(args.images[0])
    h, w = img.shape[:2]
    proj = make_projector(w, h, 1.0, cfg)
    warped = np.asarray(
        warp_image(proj, jnp.asarray(img), proj.out_h, proj.out_w, w, h)
    )
    out = _logpath("warped.jpg")
    write_rgb(out, np.where(warped < 0, 1.0, warped))
    print(f"Wrote {out}")


def mode_planet(args, cfg):
    """Toy polar remap (main.cc:294-331)."""
    from .io import read_img, write_rgb

    img = read_img(args.images[0])
    h, w = img.shape[:2]
    OUT = 1000
    c = OUT / 2
    ii, jj = np.mgrid[0:OUT, 0:OUT].astype(np.float64)
    dist = np.hypot(c - ii, c - jj)
    ok = (dist < c) & (dist > 0)
    r = h - dist / c * h
    r = np.minimum(r, h - 1)
    theta = np.arctan2(c - ii, c - jj) % (2 * np.pi)
    sx = np.clip(theta / (2 * np.pi) * w, 0, w - 2)
    sy = np.clip(r, 0, h - 2)
    x0 = sx.astype(int)
    y0 = sy.astype(int)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    out = (
        img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx) + img[y0 + 1, x0 + 1] * fy * fx
    )
    out[~ok] = 1.0
    path = _logpath("planet.jpg")
    write_rgb(path, out.astype(np.float32))
    print(f"Wrote {path}")


def mode_stitch(args, cfg):
    import jax

    from .io import write_rgb
    from .io.image import read_img_u8
    from .stitch.cylstitcher import stitch_cylinder
    from .stitch.stitcher import stitch

    t0 = time.time()
    imgs = [read_img_u8(f) for f in args.images]
    shapes = {im.shape for im in imgs}
    print(f"Read {len(imgs)} images in {time.time()-t0:.2f}s")

    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    info = {}
    graph = None
    if args.load_matchinfo:
        # the reference's fixture workflow (debug.cc:127-140, hook at
        # stitcher.cc:43-47): reload the dumped match graph and skip the
        # feature + match stages entirely
        from .io.artifacts import load_matchinfo_text

        graph = load_matchinfo_text(
            args.load_matchinfo, len(imgs), cfg.MAX_MATCHES_PER_PAIR
        )
        print(f"Loaded match graph from {args.load_matchinfo}")
    if cfg.CYLINDER:
        if len(shapes) != 1:
            raise SystemExit("CYLINDER mode requires uniform image sizes")
        if graph is not None:
            raise SystemExit("--load-matchinfo is not supported in CYLINDER "
                             "mode (it matches warped keypoints)")
        from .stitch.stitcher import _f32_to_u8

        canvas = stitch_cylinder(np.stack(imgs), cfg, key)
        canvas, valid = (np.asarray(a) for a in _f32_to_u8(canvas))
    elif len(shapes) != 1:
        # mixed sizes: per-shape feature buckets + sentinel-padded blend
        from .stitch.stitcher import stitch_hetero

        canvas, valid = stitch_hetero(imgs, cfg, key, output="u8",
                                      info_out=info)
    else:
        canvas, valid = stitch(np.stack(imgs), cfg, key, output="u8",
                               info_out=info, graph=graph)
    print(f"Stitched in {time.time()-t0:.2f}s")
    if args.dump_matchinfo and "graph" in info:
        from .io.artifacts import dump_matchinfo_text

        dump_matchinfo_text(args.dump_matchinfo, info["graph"])
        print(f"Dumped match graph to {args.dump_matchinfo}")
    if args.debug_blend and "plan" in info:
        _debug_blend_dumps(imgs, info["plan"])
    print(f"Final Image Size: ({canvas.shape[1]}, {canvas.shape[0]})")
    if info:
        # structured per-stage metrics (SURVEY §5.5): counts + residuals in
        # one machine-readable line alongside the human-readable prints
        import json

        metrics = {
            "kpt_counts": [int(c) for c in info.get("kpt_counts", [])],
            "connected_pairs": info.get("connected_pairs"),
            "total_inliers": info.get("total_inliers"),
            "ba_rms_px": round(info["ba_rms_px"], 4)
            if "ba_rms_px" in info else None,
            "ba_pairs": info.get("ba_pairs"),
            "ba_lm_iters": info.get("lm_iters"),
            "final_size": [int(canvas.shape[1]), int(canvas.shape[0])],
        }
        print("metrics: " + json.dumps(metrics))

    if cfg.CROP:
        from .ops.imgproc import crop_with_mask

        canvas = crop_with_mask(canvas, valid)
        print(f"Cropped to: ({canvas.shape[1]}, {canvas.shape[0]})")
    write_rgb(args.output, canvas)
    print(f"Wrote {args.output}")


def _debug_blend_dumps(imgs, plan):
    """Per-image blender renders, the LinearBlender::debug_run analog
    (stitch/debug.cc:19-43): each image rendered alone onto the full
    canvas, written to log/blended-<i>.jpg."""
    import jax.numpy as jnp

    from .io import write_rgb
    from .stitch.render import blend

    stack = np.stack([np.asarray(im, np.float32) / 255.0
                      if np.asarray(im).dtype == np.uint8 else np.asarray(im)
                      for im in imgs])
    dev = jnp.asarray(stack)
    for i in range(len(imgs)):
        sel = plan.items[:, 0] == i
        if not sel.any():
            continue
        sub = plan._replace(
            items=plan.items[sel],
            hulls=tuple(h for h, s in zip(plan.hulls, sel) if s),
        )
        canvas = np.asarray(blend(dev, sub, ordered=False, multiband=0))
        out = _logpath(f"blended-{i:02d}.jpg")
        write_rgb(out, np.where(canvas < 0, 1.0, canvas))
        print(f"Wrote {out}")


MODES = {
    "stitch": mode_stitch,
    "keypoint": mode_keypoint,
    "match": lambda a, c: mode_match(a, c, draw_inliers=False),
    "inlier": lambda a, c: mode_match(a, c, draw_inliers=True),
    "warp": mode_warp,
    "planet": mode_planet,
    "raw_extrema": mode_raw_extrema,
    "orientation": mode_orientation,
}


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="openpano_tpu",
        description="TPU-native panorama stitcher (OpenPano-compatible)",
    )
    ap.add_argument("images", nargs="+", help="input image files")
    ap.add_argument("-o", "--output", default="out.jpg")
    ap.add_argument("-c", "--config", default=None, help="config.cfg path")
    ap.add_argument(
        "--mode", default="stitch", choices=sorted(MODES),
        help="debug modes visualize one pipeline stage (reference main.cc)",
    )
    ap.add_argument("--seed", type=int, default=0, help="RANSAC PRNG seed")
    ap.add_argument(
        "--dump-matchinfo", metavar="PATH", default=None,
        help="dump the match graph in the reference's text format "
             "(debug.cc:111-125) after stitching",
    )
    ap.add_argument(
        "--load-matchinfo", metavar="PATH", default=None,
        help="load a dumped match graph and skip feature+match "
             "(debug.cc:127-140)",
    )
    ap.add_argument(
        "--debug-blend", action="store_true",
        help="write per-image blender renders to log/ "
             "(LinearBlender::debug_run, debug.cc:19-43)",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    MODES[args.mode](args, cfg)
    # per-label accumulated timings at exit, like the reference's
    # TotalTimerGlobalGuard (lib/timer.hh:70-84, printed from main.cc:336),
    # plus peak RSS (the reference measured it externally via src/memusg)
    from .utils import timer

    rep = timer.report()
    if rep:
        print(rep)
    print(f"peak rss: {timer.peak_rss_mb():.0f} MiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
