"""Tile-job layout for the linear blenders: coverage, hull filtering, bands."""

import numpy as np

from openpano_tpu.stitch.render import (
    RenderPlan,
    _poly_rect_intersects,
    _tile_jobs,
)


def _plan(items, hulls, out_w=1000, out_h=400):
    n = int(items[:, 0].max()) + 1 if len(items) else 1
    return RenderPlan(
        proj="flat",
        homos=np.zeros((n, 3, 3)),
        homo_invs=np.zeros((n, 3, 3)),
        whs=np.ones((n, 2)),
        proj_min=np.zeros(2),
        resolution=np.ones(2),
        out_w=out_w,
        out_h=out_h,
        ranges=items[:, 1:5].astype(np.int32),
        items=items.astype(np.int32),
        hulls=tuple(hulls),
    )


def _rect_hull(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


class TestPolyRect:
    def test_overlapping(self):
        poly = _rect_hull(10, 10, 50, 50)
        assert _poly_rect_intersects(poly, 0, 0, 20, 20)

    def test_disjoint_axis(self):
        poly = _rect_hull(10, 10, 50, 50)
        assert not _poly_rect_intersects(poly, 100, 0, 140, 40)

    def test_diamond_misses_corner(self):
        # diamond centered at (50,50) radius 20; the rect sits in the
        # bbox corner the diamond never reaches
        poly = np.array([[50, 30], [70, 50], [50, 70], [30, 50]], float)
        assert not _poly_rect_intersects(poly, 30, 30, 34, 34, margin=0.0)
        assert _poly_rect_intersects(poly, 40, 40, 60, 60, margin=0.0)

    def test_margin_dilates(self):
        poly = _rect_hull(10, 10, 20, 20)
        assert not _poly_rect_intersects(poly, 30, 30, 40, 40, margin=0.0)
        assert _poly_rect_intersects(poly, 25, 25, 40, 40, margin=8.0)


class TestTileJobs:
    def test_bbox_fully_covered(self):
        items = np.array([[0, 37, 19, 801, 333]])
        hulls = [_rect_hull(37, 19, 801, 333)]
        G, SW, Hp, Wp, _TH, _TW, band_jobs = _tile_jobs(_plan(items, hulls), groups=4)
        covered = np.zeros((400, 1000), bool)
        from openpano_tpu.stitch.render import _TILE_H, _TILE_W

        for bi, br, bo, _sid in band_jobs:
            for r, o in zip(br, bo):
                covered[o[1] : o[1] + _TILE_H, o[0] : o[0] + _TILE_W] = True
        assert covered[19:333, 37:801].all()

    def test_band_partition_invariant(self):
        # a band-g job must never write columns left of g*SW
        items = np.array([[0, 0, 0, 1000, 400], [0, 500, 100, 900, 300]])
        hulls = [_rect_hull(0, 0, 1000, 400), _rect_hull(500, 100, 900, 300)]
        G, SW, Hp, Wp, _TH, _TW, band_jobs = _tile_jobs(_plan(items, hulls), groups=4)
        for g, (bi, br, bo, _sid) in enumerate(band_jobs):
            if len(bi):
                assert (bo[:, 0] >= g * SW).all()

    def test_hull_filter_skips_unreached_tiles(self):
        # thin diagonal hull inside a big bbox: the far corners' tiles are
        # skipped
        items = np.array([[0, 0, 0, 1000, 400]])
        diag = np.array([[0, 0], [60, 0], [1000, 400], [940, 400]], float)
        G, SW, Hp, Wp, _TH, _TW, jobs_d = _tile_jobs(_plan(items, [diag]), groups=1)
        full = [_rect_hull(0, 0, 1000, 400)]
        _, _, _, _, _, _, jobs_f = _tile_jobs(_plan(items, full), groups=1)
        n_diag = sum(len(b[0]) for b in jobs_d)
        n_full = sum(len(b[0]) for b in jobs_f)
        assert 0 < n_diag < n_full

    def test_empty_bbox_emits_no_jobs(self):
        items = np.array([[0, 50, 50, 50, 200]])  # zero width
        hulls = [_rect_hull(50, 50, 50, 200)]
        _, _, _, _, _, _, band_jobs = _tile_jobs(_plan(items, hulls), groups=2)
        assert sum(len(b[0]) for b in band_jobs) == 0
