"""Accessibility (unpaired-window) probabilities from the McCaskill outside pass.

Computes pu[a, w] = P(bases a .. a+w-1 are all unpaired) for w in [1, max_w],
the quantity Vienna's pf_unstru supplies to the reference as up[i][w] (sum of
the H/I/M/E context contributions, reference src/ractip.cpp:369-375).  The four
loop contexts of an unpaired window are evaluated exactly:

  E (exterior):   q1(0..a-1) * sigma^w * q2(b+1..n-1) / Z -- direct product of
                  the exterior prefix/suffix partition functions.
  H (hairpin):    the whole hairpin interior is unpaired, so the window only
                  needs containment: a 2-D exclusive cumulative sum of
                  ob * fhn over {i < a, j > b}.
  I (interior):   band-exact probabilities P5[i,k] / P3[l,j] that a loop has
                  5'/3' unpaired band exactly (i+1..k-1) / (l+1..j-1); generic
                  loops reduce to 30 banded row-dot contractions, small loops
                  (1-bulge, 1x1/2x1/1x2/2x2) are single shifted products.
                  Windows then sum a <=30-wide suffix-summed diagonal table.
  M (multiloop):  bilinear forms L^T C R over the closing-pair matrix
                  C = ob * fmc * sigma^2, with left/right segment matrices
                  from qm/qm2 (>=1 / >=2 branch segments, unpaired runs via
                  (sigma*ml_base)^len) -- three MXU matmul chains computing all
                  (a, b) at once, scaled by (sigma*ml_base)^w.

All inputs are the scaled linear-space inside/outside tables of
ops.mccaskill; the per-base sigma powers cancel exactly in every context.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAXLOOP
from ..params.boltz import BoltzTables, get_boltz
from ..params.tables import EnergyParams
from .mccaskill import (FoldFactors, InsideState, OutsideState, W, _shift_down,
                        _shift_up, _sig_kernels, adaptive_inside, fold_factors,
                        inside, outside)


def _shift_cols(M: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[:, j] = M[:, j+k] (zero fill), static k (may be negative)."""
    L = M.shape[-1]
    if k == 0:
        return M
    if k > 0:
        k = min(k, L)
        pad = jnp.zeros(M.shape[:-1] + (k,), M.dtype)
        return jnp.concatenate([M[..., k:], pad], axis=-1)
    k = min(-k, L)
    pad = jnp.zeros(M.shape[:-1] + (k,), M.dtype)
    return jnp.concatenate([pad, M[..., : L - k]], axis=-1)


def _shift_rows(M: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i, :] = M[i+k, :] (zero fill), static k (may be negative)."""
    return _shift_cols(M.T, k).T if M.ndim == 2 else None


def _segment_matrix(M: jnp.ndarray, dtype) -> jnp.ndarray:
    """S[p, q] = M[p+1, q-1] for q - 1 >= p + 1, else 0 (empty segment -> 0)."""
    S = _shift_rows(_shift_cols(M, -1), 1)
    L = M.shape[0]
    I = jnp.arange(L)
    return jnp.where(I[None, :] - I[:, None] >= 2, S, 0.0).astype(dtype)


def _empty_matrix(smlb: jnp.ndarray, L: int, dtype) -> jnp.ndarray:
    """E[p, q] = smlb^(q - p - 1) for q >= p + 1, else 0 (0-branch segment)."""
    I = jnp.arange(L)
    d = I[None, :] - I[:, None]
    return jnp.where(d >= 1, smlb ** jnp.maximum(d - 1, 0).astype(dtype), 0.0)


def unpaired_probs(ff: FoldFactors, bt: BoltzTables, ins: InsideState,
                   out: OutsideState, n: jnp.ndarray, max_w: int,
                   dtype=jnp.float32, sigma=None) -> jnp.ndarray:
    """pu[a, w] for w in 1..max_w (column 0 unused, kept for direct indexing)."""
    L = ff.fhn.shape[0]
    sig, smlb, w2k, bulge_k = _sig_kernels(bt, sigma, dtype)
    zn = ins.zn
    qb, ob = ins.qb, out.ob
    I = jnp.arange(L)

    ws = jnp.arange(max_w + 1, dtype=jnp.int32)
    # b_of[a, w] = a + w - 1, the window end
    b_of = I[:, None] + ws[None, :] - 1
    in_range = (ws[None, :] >= 1) & (b_of < n)

    def at_ab(M: jnp.ndarray) -> jnp.ndarray:
        """Gather M[a, b] for every window (a, w); zero out of range."""
        b = jnp.clip(b_of, 0, L - 1)
        return jnp.where(in_range, jnp.take_along_axis(M, b, axis=1), 0.0)

    # ---- E: exterior ----------------------------------------------------
    q1pad = _shift_down(ins.q1, 1).at[0].set(1.0)       # Z(0..a-1), scaled
    # q2[b+1] = q2 at index a+w; build [L, max_w+1] by gathering
    q2pad = jnp.concatenate([ins.q2, jnp.ones((max_w,), dtype)])
    end_idx = jnp.clip(I[:, None] + ws[None, :], 0, L + max_w - 1)
    puE = jnp.where(in_range,
                    q1pad[:, None] * sig ** ws[None, :].astype(dtype)
                    * q2pad[end_idx] / zn, 0.0)

    # ---- H: hairpin -----------------------------------------------------
    X = ob * ff.fhn / zn
    # cum[a, b] = sum_{i < a} sum_{j > b} X[i, j]
    row_pref = jnp.cumsum(X, axis=0)                 # sum_{i <= a}
    row_pref = _shift_rows(row_pref, -1)             # sum_{i < a} (i <= a-1)
    col_suff = jnp.cumsum(row_pref[:, ::-1], axis=1)[:, ::-1]   # sum_{j >= b}
    cumH = _shift_cols(col_suff, 1)                  # sum_{j > b}
    puH = at_ab(cumH)

    # ---- I: interior loops ----------------------------------------------
    # P5[i, d] = P(loop with 5' band exactly i+1 .. i+d-1), d = k - i (inner
    # 5' pos minus outer 5' pos), band size d-1 in [1, 30] => d in [2, 31].
    # P3[j, d] = P(loop with 3' band exactly j-d+1 .. j-1), d = j - l.
    P5 = jnp.zeros((L, W + 1), dtype)
    P3 = jnp.zeros((L, W + 1), dtype)

    A = ob * ff.mout          # outer (i, j)
    B = qb * ff.minn          # inner (k, l)
    for u1 in range(1, MAXLOOP):
        # Bs[k, j] = sum_u2 w2[u1, u2] * B[k, j - 1 - u2]
        Bs = jnp.zeros((L, L), dtype)
        for u2 in range(1, MAXLOOP + 1 - u1):
            Bs = Bs + w2k[u1, u2] * _shift_cols(B, -(1 + u2))
        g5 = jnp.sum(A * _shift_rows(Bs, u1 + 1), axis=1)      # over j, at row i
        P5 = P5.at[:, u1 + 1].add(g5)
    for u2 in range(1, MAXLOOP):
        # Bs[i, l] = sum_u1 w2[u1, u2] * B[i + 1 + u1, l]
        Bs = jnp.zeros((L, L), dtype)
        for u1 in range(1, MAXLOOP + 1 - u2):
            Bs = Bs + w2k[u1, u2] * _shift_rows(B, 1 + u1)
        # g3[j] = sum_i A[i, j] * Bs[i, j - 1 - u2]
        g3 = jnp.sum(A * _shift_cols(Bs, -(1 + u2)), axis=0)   # over i, at col j
        P3 = P3.at[:, u2 + 1].add(g3)

    Aqt = qb * ff.taur        # inner pair with terminal AU (bulge inner factor)
    taus = ff.tau
    for m in range(2, MAXLOOP + 1):
        # 5' bulge size m: inner (i+m+1, j-1)
        g5 = jnp.sum(ob * taus * _shift_rows(_shift_cols(Aqt, -1), m + 1), axis=1)
        P5 = P5.at[:, m + 1].add(bulge_k[m] * g5)
        # 3' bulge size m: inner (i+1, j-m-1)
        g3 = jnp.sum(ob * taus * _shift_rows(_shift_cols(Aqt, -(m + 1)), 1), axis=0)
        P3 = P3.at[:, m + 1].add(bulge_k[m] * g3)

    def inner_at(di, dj):
        return _shift_rows(_shift_cols(qb, -dj), di)

    smalls = [
        (ff.pb15, 2, 1, 2, None),     # 1-bulge 5': band {i+1}, d5 = 2
        (ff.pb13, 1, 2, None, 2),     # 1-bulge 3': band {j-1}, d3 = 2
        (ff.p11, 2, 2, 2, 2),         # 1x1
        (ff.p21a, 2, 3, 2, 3),        # 1x2 (1 unpaired on 5', 2 on 3')
        (ff.p21b, 3, 2, 3, 2),        # 2x1
        (ff.p22, 3, 3, 3, 3),         # 2x2
    ]
    for P, di, dj, d5band, d3band in smalls:
        contrib = ob * P * inner_at(di, dj)
        if d5band is not None:
            P5 = P5.at[:, d5band].add(jnp.sum(contrib, axis=1))
        if d3band is not None:
            P3 = P3.at[:, d3band].add(jnp.sum(contrib, axis=0))

    # suffix-sum over band width d: S5[i, m] = sum_{d >= m} P5[i, d]
    S5 = jnp.cumsum(P5[:, ::-1], axis=1)[:, ::-1] / zn
    S3 = jnp.cumsum(P3[:, ::-1], axis=1)[:, ::-1] / zn

    # pu_I5[a, b] = sum_{i = b-30 .. a-1} S5[i, max(b - i + 1, 2)]
    # window over at most 30 rows; gather per offset t = a - 1 - i (0..29)
    puI = jnp.zeros((L, max_w + 1), dtype)
    for t in range(MAXLOOP):
        i5 = I[:, None] - 1 - t                          # [L, 1] row index
        m5 = jnp.clip(b_of - i5 + 1, 2, W + 1 - 1)       # needed band width
        ok5 = (i5 >= 0) & (b_of - i5 <= MAXLOOP) & in_range
        v5 = S5[jnp.clip(i5, 0, L - 1), jnp.where(ok5, m5, W)]
        puI = puI + jnp.where(ok5, v5, 0.0)
        # 3' bands: pu_I3[a, b] = sum_{j = b+1 .. a+30} S3[j, max(j - a + 1, 2)]
        j3 = b_of + 1 + t
        m3 = jnp.clip(j3 - I[:, None] + 1, 2, W)
        ok3 = (j3 < L) & (j3 - I[:, None] <= MAXLOOP) & in_range
        v3 = S3[jnp.clip(j3, 0, L - 1), jnp.where(ok3, m3, W)]
        puI = puI + jnp.where(ok3, v3, 0.0)

    # ---- M: multiloop ---------------------------------------------------
    # M_ab[a, b] = sum_{i<a, j>b} L[i, a] * C[i, j] * R[j, b] over three
    # branch-count splits (left >=2 / exactly 1 / 0, right any / >=1 / >=2).
    C = ob * ff.fmc * sig ** 2 / zn                      # closing pair (i, j)
    qmS = _segment_matrix(ins.qm, dtype)                 # [p, q] -> qm(p+1..q-1)
    qm2S = _segment_matrix(ins.qm2, dtype)
    Erun = _empty_matrix(smlb, L, dtype)                 # [p, q] -> 0-branch run
    # right matrices indexed [j, b]: segment (b+1 .. j-1) = leftform[b, j].T
    M_ab = (qm2S.T @ C) @ (qmS + Erun).T \
        + ((qmS - qm2S).T @ C) @ qmS.T \
        + (Erun.T @ C) @ qm2S.T
    # M_ab[a, b]; scale by the window's unpaired-run factor
    puM = at_ab(M_ab) * smlb ** ws[None, :].astype(dtype)

    pu = puE + puH + puI + puM
    return jnp.where(in_range, pu, 0.0)


def accessibility(params: EnergyParams, S: jnp.ndarray, n: jnp.ndarray,
                  max_w: int, dtype=jnp.float32, scale_e=None,
                  allow=None) -> jnp.ndarray:
    """pu[a, w] = P(window a .. a+w-1 unpaired), w in 1..max_w.

    Adaptive pf scaling per instance (see ops.mccaskill.adaptive_inside)."""
    bt = get_boltz(params)
    if scale_e is None:
        es, ins = adaptive_inside(bt, S, n, dtype, allow=allow)
    else:
        es, ins = jnp.asarray(scale_e, dtype), None
    sig = jnp.exp(-es / jnp.asarray(bt.kt, dtype))
    ff = fold_factors(bt, S, n, dtype, sig, allow)
    if ins is None:
        ins = inside(ff, bt, n, dtype, sig)
    out = outside(ff, bt, ins, n, dtype, sig)
    return unpaired_probs(ff, bt, ins, out, n, max_w, dtype, sig)
