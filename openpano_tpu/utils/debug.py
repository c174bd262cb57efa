"""Numeric guard mode: the reference's m_assert/print_debug analog.

Reference: lib/debugutils.hh:41-52 — `m_assert` aborts with file:line when
a debug-build invariant fails.  The TPU analog (SURVEY §5.2) has two
layers, both enabled by ``OPENPANO_CHECK_NUMERICS=1`` (off by default:
functional JAX code is race-free by construction, and these checks add
host syncs / checkify overhead):

1. Stage-boundary guards: after each pipeline stage the stitcher calls
   :func:`assert_finite` on the stage's outputs; a NaN/Inf raises
   :class:`NumericsError` naming the stage, the leaf, and the bad-element
   count — the structured equivalent of m_assert's file:line.
2. In-kernel checkify: the LM bundle-adjustment loop (the numerically
   hottest kernel — f64 normal equations with ~1e10 cancellations) runs
   under ``jax.experimental.checkify`` float checks, surfacing the first
   NaN/Inf *produced inside the jit* instead of a poisoned result.
"""

from __future__ import annotations

import os

import numpy as np


class NumericsError(AssertionError):
    """A pipeline stage produced NaN/Inf under OPENPANO_CHECK_NUMERICS."""


def numeric_checks_enabled() -> bool:
    return os.environ.get("OPENPANO_CHECK_NUMERICS", "") == "1"


def assert_finite(stage: str, **named_arrays) -> None:
    """Host-side finite check of stage outputs (no-op unless enabled).

    Fetches each array (a sync point — debug mode trades speed for
    placement precision) and raises NumericsError naming the first
    offending leaf."""
    if not numeric_checks_enabled():
        return
    for name, arr in named_arrays.items():
        if arr is None:
            continue
        a = np.asarray(arr)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        bad = ~np.isfinite(a)
        if bad.any():
            idx = np.argwhere(bad)[0]
            raise NumericsError(
                f"[{stage}] '{name}' has {int(bad.sum())} non-finite "
                f"values (first at index {tuple(int(i) for i in idx)}, "
                f"shape {a.shape})"
            )
