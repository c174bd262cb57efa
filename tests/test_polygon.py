"""Polygon utilities vs brute-force/NumPy oracles (reference: lib/polygon.cc)."""

import numpy as np

from openpano_tpu.geometry.polygon import convex_hull, points_in_polygon, polygon_area


class TestConvexHull:
    def test_square_with_interior(self, rng):
        corners = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
        interior = rng.uniform(0.5, 3.5, size=(50, 2))
        hull = convex_hull(np.vstack([corners, interior]))
        assert hull.shape == (4, 4 // 2)
        assert {tuple(v) for v in hull} == {tuple(c) for c in corners}

    def test_collinear_points_dropped(self):
        pts = np.array([[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [1, 2]], float)
        hull = convex_hull(pts)
        assert {tuple(v) for v in hull} == {(0, 0), (2, 0), (2, 2), (0, 2)}

    def test_area_of_hull_max(self, rng):
        pts = rng.normal(size=(200, 2))
        hull = convex_hull(pts)
        # hull area >= area of any triangle of sample points
        a = polygon_area(hull)
        for _ in range(20):
            tri = pts[rng.choice(200, 3, replace=False)]
            assert a >= polygon_area(tri) - 1e-12


class TestArea:
    def test_unit_square(self):
        assert polygon_area(np.array([[0, 0], [1, 0], [1, 1], [0, 1]])) == 1.0

    def test_orientation_invariant(self):
        p = np.array([[0, 0], [2, 0], [2, 3], [0, 3]], float)
        assert polygon_area(p) == polygon_area(p[::-1]) == 6.0

    def test_degenerate(self):
        assert polygon_area(np.array([[0, 0], [1, 1]])) == 0.0


class TestPointInPolygon:
    def test_square(self):
        poly = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
        q = np.array([[1, 1], [3, 1], [-0.1, 0.5], [1.999, 1.999], [2, 1], [0, 0]])
        got = points_in_polygon(q, poly)
        np.testing.assert_array_equal(got, [True, False, False, True, True, True])

    def test_concave(self):
        # L-shape: the notch is outside
        poly = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], float)
        q = np.array([[0.5, 2.0], [2.0, 0.5], [2.0, 2.0], [0.5, 0.5]])
        np.testing.assert_array_equal(
            points_in_polygon(q, poly), [True, True, False, True]
        )

    def test_matches_halfplane_oracle(self, rng):
        # genuinely convex polygon (hull of random points); oracle: point is
        # inside a convex polygon iff all edge cross products share a sign
        poly = convex_hull(rng.normal(size=(30, 2)))
        q = rng.uniform(-2.2, 2.2, size=(500, 2))
        a, b = poly, np.roll(poly, -1, axis=0)
        cross = (b[None, :, 0] - a[None, :, 0]) * (q[:, None, 1] - a[None, :, 1]) - (
            b[None, :, 1] - a[None, :, 1]
        ) * (q[:, None, 0] - a[None, :, 0])
        oracle = np.all(cross >= 0, axis=1) | np.all(cross <= 0, axis=1)
        np.testing.assert_array_equal(points_in_polygon(q, poly), oracle)
