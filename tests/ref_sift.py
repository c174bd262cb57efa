"""Tiny NumPy re-implementation of the reference SIFT pipeline semantics,
used as the golden for unit tests (scalar loops, written independently from
the JAX code so bugs don't cancel out)."""

from __future__ import annotations

import math

import numpy as np


def gauss_kernel(sigma, window_factor=6):
    kw = int(math.ceil(0.3 * (sigma / 2 - 1) + 0.8) * window_factor)
    if kw % 2 == 0:
        kw += 1
    c = kw // 2
    i = np.arange(-c, c + 1)
    k = np.exp(-(i.astype(np.float64) ** 2) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def blur(img, sigma, window_factor=6):
    k = gauss_kernel(sigma, window_factor)
    c = len(k) // 2
    # column pass then row pass with border replication
    tmp = np.empty_like(img)
    padded = np.pad(img, ((c, c), (0, 0)), mode="edge")
    for i in range(img.shape[0]):
        tmp[i] = (padded[i : i + 2 * c + 1] * k[:, None]).sum(axis=0)
    out = np.empty_like(img)
    padded = np.pad(tmp, ((0, 0), (c, c)), mode="edge")
    for j in range(img.shape[1]):
        out[:, j] = (padded[:, j : j + 2 * c + 1] * k[None, :]).sum(axis=1)
    return out


def resize_bilinear(src, out_h, out_w):
    src = np.asarray(src, np.float32)
    h, w = src.shape[:2]
    chans = src.shape[2] if src.ndim == 3 else 1
    s2 = src.reshape(h, w, chans)
    out = np.empty((out_h, out_w, chans), np.float32)
    for dx in range(out_h):
        rx = (dx + 0.5) * h / out_h - 0.5
        sx = math.floor(rx)
        rx -= sx
        if sx < 0:
            sx, rx = 0, 0.0
        elif sx + 1 >= h:
            sx, rx = h - 2, 1.0
        for dy in range(out_w):
            ry = (dy + 0.5) * w / out_w - 0.5
            sy = math.floor(ry)
            ry -= sy
            if sy < 0:
                sy, ry = 0, 0.0
            elif sy + 1 >= w:
                sy, ry = w - 2, 1.0
            out[dx, dy] = rx * (s2[sx + 1, sy + 1] * ry + s2[sx + 1, sy] * (1 - ry)) + (
                1 - rx
            ) * (s2[sx, sy + 1] * ry + s2[sx, sy] * (1 - ry))
    return out if src.ndim == 3 else out[:, :, 0]


def mag_ort(level):
    h, w = level.shape
    mag = np.zeros((h, w), np.float32)
    ort = np.full((h, w), np.pi, np.float32)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            dy = level[y + 1, x] - level[y - 1, x]
            dx = level[y, x + 1] - level[y, x - 1]
            mag[y, x] = math.hypot(dx, dy)
            if max(abs(dx), abs(dy)) < 1e-6:
                ort[y, x] = 0.0
            else:
                ort[y, x] = math.atan2(dy, dx) + math.pi
    return mag, ort


def candidate_extrema(dog, pre_thres, diff_thres, num_scale):
    """dog: [L,h,w]; returns list of (j, y, x) in reference scan order."""
    L, h, w = dog.shape
    out = []
    for j in range(1, num_scale - 2):
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                center = dog[j, y, x]
                if center < pre_thres:
                    continue
                nbr = []
                for ds in (-1, 0, 1):
                    for di in (-1, 0, 1):
                        for dj in (-1, 0, 1):
                            if ds == 0 and di == 0 and dj == 0:
                                continue
                            nbr.append(dog[j + ds, y + di, x + dj])
                nbr = np.array(nbr)
                if (nbr < center - diff_thres).all() or (nbr > center + diff_thres).all():
                    out.append((j, y, x))
    return out
