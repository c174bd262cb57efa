"""Polygon utilities: convex hull, area, point-in-polygon.

Reference: lib/polygon.{hh,cc} — Andrew monotone-chain ``convex_hull``
(polygon.cc:17-46), shoelace ``polygon_area`` (polygon.cc:48-60), and
``PointInPolygon`` (polygon.cc:62-83), which the reference uses to count
keypoints/matches inside the overlap region during RANSAC acceptance
(transform_estimate.cc:150-218).

The reference's PointInPolygon precomputes vertex angles around the
centroid and answers queries with a binary search — O(log n) but only
approximate for non-star-shaped polygons.  Here queries are batched, so
the TPU-native form is an exact vectorized ray-crossing test over all
edges at once ([Q, E] comparisons on the VPU) — same asymptotic work per
query lane, exact for any simple polygon.  The RANSAC device path uses the
rasterized ``overlap_area_fraction`` (geometry/homography.py) instead;
these utilities serve planning/debug and host-side geometry.
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain (reference: polygon.cc:17-46).

    points: [N, 2].  Returns hull vertices [M, 2] in counter-clockwise
    order (y up), without repeating the first vertex.
    """
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    n = pts.shape[0]
    if n <= 2:
        return pts
    # lexicographic sort (x, then y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area, absolute (reference: polygon.cc:48-60). poly: [M, 2]."""
    p = np.asarray(poly, np.float64)
    if p.shape[0] < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return float(abs(np.sum(x * yn - xn * y)) * 0.5)


def points_in_polygon(points: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Batched exact point-in-polygon by ray crossing.

    points: [Q, 2]; poly: [M, 2] simple polygon (any orientation).
    Returns [Q] bool.  Boundary points count as inside (consistent with the
    reference's same-side test accepting the boundary, polygon.cc:75-82).
    """
    q = np.asarray(points, np.float64)
    p = np.asarray(poly, np.float64)
    if p.shape[0] < 3:
        return np.zeros(q.shape[0], dtype=bool)
    a = p[None, :, :]                      # [1, M, 2] edge starts
    b = np.roll(p, -1, axis=0)[None, :, :] # [1, M, 2] edge ends
    x, y = q[:, :1], q[:, 1:2]             # [Q, 1]

    ay, by = a[..., 1], b[..., 1]
    ax, bx = a[..., 0], b[..., 0]
    spans = (ay > y) != (by > y)           # edge straddles the ray's y
    denom = np.where(by - ay == 0, 1.0, by - ay)
    xint = ax + (y - ay) / denom * (bx - ax)
    crossings = np.sum(spans & (x < xint), axis=1)
    inside = (crossings % 2) == 1

    # boundary: point on any edge segment counts as inside
    cross = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
    on_line = np.abs(cross) < 1e-12 * np.maximum(
        1.0, np.abs(bx - ax) + np.abs(by - ay)
    )
    within = (
        (np.minimum(ax, bx) - 1e-12 <= x) & (x <= np.maximum(ax, bx) + 1e-12)
        & (np.minimum(ay, by) - 1e-12 <= y) & (y <= np.maximum(ay, by) + 1e-12)
    )
    return inside | np.any(on_line & within, axis=1)
