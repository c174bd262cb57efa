"""Cyclic block-tridiagonal solver for chain/ring bundle adjustment.

Reference scale context: the reference's LM solves the dense 6n x 6n
normal equations with colPivHouseholderQr
(incremental_bundle_adjuster.cc:222-250) — fine at n <= 50, hopeless at
n = 500 (a 3000^3 dense factorization per LM iteration).  For ORDERED
sequences the match graph is a chain (+ the head-tail wrap pair,
stitcher.cc:116-136), so JtJ is block-TRIDIAGONAL with one 6x6 corner
block — exactly solvable in O(n) by block Thomas elimination, with the
cyclic corner folded in by the Woodbury identity:

    A = T + P Q^T,   P = [E_0 C | E_{n-1} C^T],  Q = [E_{n-1} | E_0]
    A^-1 b = T^-1 b - T^-1 P (I_12 + Q^T T^-1 P)^-1 Q^T T^-1 b

The forward/backward sweeps are `lax.scan`s over [n, 6, 6] blocks — a
few thousand FLOPs per step, f64, sequential but tiny (the TPU-native
answer to "sparse BA": structure-exact elimination instead of a sparse
library).  SPD is not assumed of T (the corner subtraction can break
it); plain block LU without pivoting is stable here because the LM
damping keeps the block diagonal strongly dominant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def thomas_block_solve(D, U, B):
    """Solve T X = B for block-tridiagonal T.

    D: [n, 6, 6] diagonal blocks; U: [n, 6, 6] with U[i] the (i, i+1)
    block (U[n-1] ignored); lower blocks are U[i]^T (symmetric input).
    B: [n, 6, k] right-hand sides.  Returns X [n, 6, k]."""
    # Forward elimination with U_{i-1} threaded explicitly (shift by one):
    #   denom_i = D_i - U_{i-1}^T c_{i-1}
    #   c_i = denom_i^{-1} U_i ;  d_i = denom_i^{-1} (B_i - U_{i-1}^T d_{i-1})
    Um1 = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)

    def fwd_step(carry, x):
        c_prev, d_prev = carry
        Di, Ui, Bi, Lm1T = x          # Lm1T = U_{i-1} (so L_i = Lm1T^T)
        LT = jnp.swapaxes(Lm1T, 0, 1)
        denom = Di - LT @ c_prev
        rhs = Bi - LT @ d_prev
        ci = jnp.linalg.solve(denom, Ui)
        di = jnp.linalg.solve(denom, rhs)
        return (ci, di), (ci, di)

    k = B.shape[-1]
    c0 = jnp.zeros_like(D[0])
    d0 = jnp.zeros((6, k), B.dtype)
    _, (cs, ds) = jax.lax.scan(fwd_step, (c0, d0), (D, U, B, Um1))

    def bwd_step(x_next, x):
        ci, di = x
        xi = di - ci @ x_next
        return xi, xi

    _, xs = jax.lax.scan(bwd_step, jnp.zeros((6, k), B.dtype), (cs, ds),
                         reverse=True)
    return xs


def solve_block_cyclic(D, U, C, b):
    """Solve A x = b where A is symmetric block-tridiagonal (+ optional
    cyclic corner): diag D [n,6,6], upper U[i] = A(i, i+1) [n,6,6]
    (U[n-1] ignored), corner C = A(0, n-1) [6,6] or None, b [n,6].
    Returns x [n,6] (same dtype)."""
    n = D.shape[0]
    if C is None or n < 3:
        X = thomas_block_solve(D, U, b[..., None])
        return X[..., 0]
    # Woodbury fold of the corner: columns [b | E_0 C | E_{n-1} C^T]
    P = jnp.zeros((n, 6, 12), D.dtype)
    P = P.at[0, :, :6].set(C)
    P = P.at[n - 1, :, 6:].set(C.T)
    B = jnp.concatenate([b[..., None], P], axis=-1)       # [n,6,13]
    X = thomas_block_solve(D, U, B)
    y = X[..., 0]                                          # T^-1 b
    Z = X[..., 1:]                                         # T^-1 P
    # Q^T v selects (block n-1, block 0) stacked
    QtY = jnp.concatenate([y[n - 1], y[0]])                # [12]
    QtZ = jnp.concatenate([Z[n - 1], Z[0]], axis=0)        # [12,12]
    S = jnp.eye(12, dtype=D.dtype) + QtZ
    w = jnp.linalg.solve(S, QtY)
    return y - Z @ w


def assemble_banded(Bp, bp, F, Tc, n_cam):
    """Accumulate per-pair [12,12]/[12] normal-equation blocks into the
    banded layout.  F/Tc: [P] camera indices per pair slot; every pair
    must satisfy |F - Tc| == 1 or {F, Tc} == {0, n-1} (chain + wrap).

    Block row order inside Bp is [F(6) | Tc(6)] (matching
    bundle_adjuster._pairs_normal_equations).  Returns (D [n,6,6],
    U [n,6,6], C [6,6], rhs [n,6])."""
    dt = Bp.dtype
    D = jnp.zeros((n_cam, 6, 6), dt)
    U = jnp.zeros((n_cam, 6, 6), dt)
    C = jnp.zeros((6, 6), dt)
    rhs = jnp.zeros((n_cam, 6), dt)
    B_FF = Bp[:, :6, :6]
    B_FT = Bp[:, :6, 6:]
    B_TT = Bp[:, 6:, 6:]
    D = D.at[F].add(B_FF).at[Tc].add(B_TT)
    rhs = rhs.at[F].add(bp[:, :6]).at[Tc].add(bp[:, 6:])
    lo = jnp.minimum(F, Tc)
    hi = jnp.maximum(F, Tc)
    adj = hi - lo == 1
    wrap = (lo == 0) & (hi == n_cam - 1)
    # (lo, hi) block: B_FT when F==lo else B_FT^T
    blk = jnp.where((F == lo)[:, None, None], B_FT,
                    jnp.swapaxes(B_FT, 1, 2))
    U = U.at[jnp.where(adj, lo, n_cam)].add(
        jnp.where(adj[:, None, None], blk, 0.0), mode="drop")
    C = C + jnp.sum(jnp.where(wrap[:, None, None], blk, 0.0), axis=0)
    return D, U, C, rhs


def is_chain_structure(cam_a, cam_b, n_cam: int) -> bool:
    """Host-side check: every pair is an adjacent (i, i+1) pair or the
    (0, n-1) wrap — the ordered-input ring graph."""
    import numpy as np

    a = np.minimum(cam_a, cam_b)
    b = np.maximum(cam_a, cam_b)
    adj = (b - a) == 1
    wrap = (a == 0) & (b == n_cam - 1)
    return bool(np.all(adj | wrap))
