"""Pallas TPU megakernels for the co-folding (joint two-strand) DP.

Extends ops/scan_pallas.py's column-scan design to ops.cofold's cut-aware
recurrences (the reference's default hybridization source: Vienna co_pf_fold
over s1+s2 with cut_point = |s1|+1, reference src/ractip.cpp:384-459):

  * every loop-stretch term is gated by the dynamic cut masks (M5 jumps,
    J1 junctions, the window's source-column mask) -- cut = n1 is a
    PER-INSTANCE [B] input, so the masks are [B, L] tiles precomputed into
    scratch at the first grid step;
  * the exterior-segment table qx is a second resident matrix; its
    column recurrence is one more statically-unrolled contraction;
  * the exposed-cut spanning-pair cases read qxA = qx[:, cut-1] (captured
    in-flight when the scan crosses the cut) and, in the outside pass,
    accumulate the spanning-pair adjoints (vvec / wvec / GA) exactly as
    ops.cofold.co_outside's two-phase sweep does -- the phase boundary
    becomes a per-instance blend plus a pl.when-gated GA build.

Semantics are IDENTICAL to ops.cofold.co_inside/co_outside;
tests/test_cofold_pallas.py asserts agreement in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAXLOOP
from ..params.boltz import BoltzTables, get_boltz
from .cofold import CoFactors, CoInsideState
from .mccaskill import HUGE, SCALE_E0, ZHI, ZLO, W
from .scan_pallas import (F32, POW2, _at, _clamp, _lane_iota, _ldn, _lup,
                          _pad_batch, _prefix_scan, _sig_tables,
                          _suffix_scan, q2_pallas)

CO_FIELDS = CoFactors._fields                   # 16 names (15 + fcx)


def _m5(d, cut, lane):
    """M5[d]: allow a 5' jump i -> i+d.  [B, L] float mask."""
    return (~((lane < cut) & (cut <= lane + d))).astype(F32)


def _onehot_read(t, idx):
    """t[:, idx] -> [B, 1] via one-hot lane reduction (idx traced scalar)."""
    lane = _lane_iota(t.shape)
    return jnp.sum(jnp.where(lane == idx, t, 0.0), axis=1, keepdims=True)


# --------------------------------------------------------------------------
# inside kernel
# --------------------------------------------------------------------------

def _onehot_read_row(t, idx_vec):
    """t[:, idx_vec[b]] per batch row -> [B, 1] (idx per-instance [B, 1])."""
    lane = _lane_iota(t.shape)
    return jnp.sum(jnp.where(lane == idx_vec, t, 0.0), axis=1, keepdims=True)


# --------------------------------------------------------------------------
# outside kernel
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# streamed-state kernels (long concatenations, L1+L2 > 320)
#
# Same treatment as scan_pallas' streamed variant: column-stream outputs
# instead of VMEM-resident natural blocks, chunked fori_loop contractions
# (scan_pallas._contract_scan / _scatter_rank1_scan) instead of L-deep
# static unrolls, and qx handed to the outside pass in (L_i, B, L_cols)
# layout so its row reads are dynamic leading-dim slices.  The qxA / qBpref
# exterior-segment vectors are precomputed OUTSIDE the kernel (one gather
# each) instead of being rebuilt from a resident qx block at _init.
# --------------------------------------------------------------------------

from .scan_pallas import (_contract_scan, _scatter_rank1_scan,  # noqa: E402
                          _from_cbl, _streamed_b_blk)


def _co_inside_kernel_streamed(
        fhn, pstk, p11, p21a, p21b, p22, pb15, pb13, tau, taur, mout, minn,
        fmb, fmc, fe, fcx,
        w2k, bulge_k, sig, pows, cut,
        qm1c_o, qb_o, qm_o, qx_o,               # column streams (1, B, L)
        q1_o,                                   # resident (B, L)
        qmS, qxS, Qb, Mb, Ab, qm1P, qxP, qxA, q1S, M5S, J1S,
        *, L: int, B: int, unroll: bool = False):
    j = pl.program_id(1)
    ct = cut[:, 0:1]
    lane = _lane_iota((B, L))

    def contract(ref, v):
        # acc[b, i] = sum_l ref[l, b, i] * v[b, l]; every call site passes v
        # shifted up one lane (v[:, L-1] == 0), so the unrolled sum stops at
        # L-2.  unroll=True (short L) avoids the dynamic-slice + lane-roll
        # cost of the chunked scan (see RESULTS round 5).
        if not unroll:
            return _contract_scan(ref, v, L, B)
        acc = jnp.zeros((B, L), F32)
        for l in range(L - 1):
            acc = acc + ref[l] * v[:, l:l + 1]
        return acc

    @pl.when(j == 0)
    def _init():
        qmS[...] = jnp.zeros_like(qmS)
        qxS[...] = jnp.zeros_like(qxS)
        Qb[...] = jnp.zeros_like(Qb)
        Mb[...] = jnp.zeros_like(Mb)
        Ab[...] = jnp.zeros_like(Ab)
        qm1P[...] = jnp.zeros_like(qm1P)
        qxP[...] = jnp.zeros_like(qxP)
        qxA[...] = jnp.zeros_like(qxA)
        q1S[...] = jnp.zeros_like(q1S)
        for d in range(W + 2):
            M5S[d] = _m5(d, ct, lane)
        J1S[...] = (lane != ct).astype(F32)

    col = lambda r: r[0]
    sg = sig[:, 0:1]
    sm = pows[:, 0:1]
    J1 = J1S[...]

    qxA_new = jnp.where(lane < ct, qxP[...],
                        jnp.where(lane == ct, 1.0, 0.0))
    qxA[...] = jnp.where(j == ct, qxA_new, qxA[...])

    def bm(b):
        src = j - W + b
        return ((src >= ct) | (j < ct)).astype(F32)

    X = [Qb[b] * Mb[b] * bm(b) for b in range(W)]
    A = [Qb[b] * Ab[b] * bm(b) for b in range(W)]

    gen = jnp.zeros((B, L), F32)
    for u1 in range(1, MAXLOOP):
        acc = None
        for b in range(u1, W - 1):
            t = X[b] * _at(w2k, u1, W - 1 - b)
            acc = t if acc is None else acc + t
        if acc is not None:
            gen = gen + M5S[u1 + 1] * _lup(acc, u1 + 1)
    gen = gen * col(mout)

    acol = A[W - 1]
    b5 = jnp.zeros((B, L), F32)
    for m in range(2, MAXLOOP + 1):
        b5 = b5 + bulge_k[:, m:m + 1] * M5S[m + 1] * _lup(acol, m + 1)
    b3 = jnp.zeros((B, L), F32)
    for b in range(0, W - 2):
        b3 = b3 + A[b] * bulge_k[:, W - 1 - b:W - b]
    bulges = col(tau) * (b5 + M5S[1] * _lup(b3, 1))

    v = _lup(qm1P[...], 1) * _lup(J1, 1)
    qm2col = _clamp(contract(qmS, v))

    qxB = jnp.where(j > ct, _onehot_read_row(qxP[...], ct), 1.0)
    spancol = col(fcx) * _lup(qxA[...], 1) * qxB

    mlgate = (j != ct).astype(F32)
    qbcol = (col(fhn) + gen + bulges
             + col(pstk) * _lup(Qb[W - 1], 1)
             + col(p11) * _lup(Qb[W - 2], 2)
             + col(p21a) * _lup(Qb[W - 3], 2)
             + col(p21b) * _lup(Qb[W - 2], 3)
             + col(p22) * _lup(Qb[W - 3], 3)
             + col(pb15) * _lup(Qb[W - 1], 2)
             + col(pb13) * _lup(Qb[W - 2], 1)
             + mlgate * col(fmc) * sg * sg * (M5S[1] * _lup(qm2col, 1))
             + spancol)
    qbcol = _clamp(qbcol)

    qm1col = _clamp(mlgate * sm * qm1P[...] + qbcol * col(fmb))

    vfull = _suffix_scan(qm1col, pows, L)
    vlow = _suffix_scan(qm1col * (lane < ct).astype(F32), pows, L)
    dterm = jnp.where(lane < ct, vlow, vfull)
    v2 = _lup(qm1col, 1) * _lup(J1, 1)
    ml2 = contract(qmS, v2)
    qmcol = _clamp(dterm + ml2)

    q1_prev = _onehot_read(q1S[...], j - 1)
    q1_prev = jnp.where(j >= 1, q1_prev, 1.0)
    q1pad = jnp.where(lane == 0, 1.0, _ldn(q1S[...], 1))
    qbecol = qbcol * col(fe)
    q1val = _clamp(sg * q1_prev
                   + jnp.sum(q1pad * qbecol, axis=1, keepdims=True))
    q1S[...] = jnp.where(lane == j, q1val, q1S[...])

    # qxsh[i] = sum_k qxS[k-1, :, i] * qbecol[:, k]
    qxsh = contract(qxS, _lup(qbecol, 1))
    onej = (lane == j).astype(F32)
    qxcol = _clamp(sg * (qxP[...] + onej) + qxsh + qbecol)

    qmS[j] = qmcol
    qxS[j] = qxcol
    Qb[...] = jnp.concatenate([Qb[1:], qbcol[None]], axis=0)
    Mb[...] = jnp.concatenate([Mb[1:], col(minn)[None]], axis=0)
    Ab[...] = jnp.concatenate([Ab[1:], col(taur)[None]], axis=0)
    qm1P[...] = qm1col
    qxP[...] = qxcol

    qm1c_o[0] = qm1col
    qb_o[0] = qbcol
    qm_o[0] = qmcol
    qx_o[0] = qxcol
    q1_o[...] = q1S[...]


def co_inside_pallas_streamed(factors_cbl, w2k, bulge_k, sig, pows, cut,
                              L: int, B: int, b_blk: int,
                              interpret: bool = False, unroll: bool = False):
    """Streamed inside pass: returns (qm1_c, qb_c, qm_c, qx_c, q1), the
    first four in column-stream (L_cols, B, L_i) layout.  unroll=True
    statically unrolls the contractions (fast for short L)."""
    assert unroll or L % 8 == 0, (
        f"streamed kernels contract in chunks of 8: pad L={L} to a "
        f"multiple of 8 (pipeline callers bucket to multiples of 32)")
    from .scan_pallas import _chunk_batch
    if b_blk < 8 and B > b_blk:
        return _chunk_batch(
            lambda cbl, row: co_inside_pallas_streamed(
                cbl, *row, L, b_blk, b_blk, interpret, unroll),
            b_blk, B, tuple(factors_cbl),
            (w2k, bulge_k, sig, pows, cut), 4)
    nb = B // b_blk
    fcol = pl.BlockSpec((1, b_blk, L), lambda b, j: (j, b, 0))

    def fall(shape):
        return pl.BlockSpec(shape, lambda b, j: (b,) + (0,) * (len(shape) - 1))

    cmat = jax.ShapeDtypeStruct((L, B, L), F32)
    return pl.pallas_call(
        functools.partial(_co_inside_kernel_streamed, L=L, B=b_blk,
                          unroll=unroll),
        grid=(nb, L),
        in_specs=[fcol] * 16 + [fall((b_blk, W, W)), fall((b_blk, W)),
                                fall((b_blk, 1)), fall((b_blk, POW2)),
                                fall((b_blk, 1))],
        out_specs=(fcol, fcol, fcol, fcol,
                   pl.BlockSpec((b_blk, L), lambda b, j: (b, 0))),
        out_shape=(cmat, cmat, cmat, cmat,
                   jax.ShapeDtypeStruct((B, L), F32)),
        scratch_shapes=[
            pltpu.VMEM((L, b_blk, L), F32),     # qmS
            pltpu.VMEM((L, b_blk, L), F32),     # qxS
            pltpu.VMEM((W, b_blk, L), F32),     # Qb
            pltpu.VMEM((W, b_blk, L), F32),     # Mb
            pltpu.VMEM((W, b_blk, L), F32),     # Ab
            pltpu.VMEM((b_blk, L), F32),        # qm1P
            pltpu.VMEM((b_blk, L), F32),        # qxP
            pltpu.VMEM((b_blk, L), F32),        # qxA
            pltpu.VMEM((b_blk, L), F32),        # q1S
            pltpu.VMEM((W + 2, b_blk, L), F32),  # M5S
            pltpu.VMEM((b_blk, L), F32),        # J1S
        ],
        interpret=interpret,
    )(*factors_cbl, w2k, bulge_k, sig, pows, cut)


def _co_outside_kernel_streamed(
        fe, fmb, fmc, mout, minn, taur, tau, fcx,
        pstk1, p111, p21a1, p21b1, p221, pb151, pb131,
        qm1c, qm1m,
        qmT, qxT, qxAin, qBin, q1pad, q2,
        w2k, bulge_k, sig, pows, cut,
        ob_o,                                   # column stream (1, B, L)
        omS, Ob, OMb, OAb, pendS, sm1S, vvecS, wvecS, GAS, M5S, J1S,
        *, L: int, B: int, unroll: bool = False):
    j = pl.program_id(1)
    c = L - 1 - j
    ct = cut[:, 0:1]
    lane = _lane_iota((B, L))

    def contract(ref, v):
        # acc[b, i] = sum_l ref[l, b, i] * v[b, l] over the FULL l range
        # (callers pass unshifted vectors here).
        if not unroll:
            return _contract_scan(ref, v, L, B)
        acc = jnp.zeros((B, L), F32)
        for i in range(L):
            acc = acc + ref[i] * v[:, i:i + 1]
        return acc

    @pl.when(j == 0)
    def _init():
        omS[...] = jnp.zeros_like(omS)
        Ob[...] = jnp.zeros_like(Ob)
        OMb[...] = jnp.zeros_like(OMb)
        OAb[...] = jnp.zeros_like(OAb)
        pendS[...] = jnp.zeros_like(pendS)
        sm1S[...] = jnp.zeros_like(sm1S)
        vvecS[...] = jnp.zeros_like(vvecS)
        wvecS[...] = jnp.zeros_like(wvecS)
        GAS[...] = jnp.zeros_like(GAS)
        for d in range(W + 2):
            M5S[d] = _m5(d, ct, lane)
        J1S[...] = (lane != ct).astype(F32)

    col = lambda r: r[0]
    sg = sig[:, 0:1]
    sm = pows[:, 0:1]
    J1 = J1S[...]
    qxAS = qxAin[...]
    qBprefS = qBin[...]

    omcol = omS[c]
    qmt = contract(qmT, omcol)
    pfull = _prefix_scan(omcol, pows, L)
    phigh = _prefix_scan(omcol * (lane >= ct).astype(F32), pows, L)
    dterm = jnp.where(lane < ct, pfull, phigh)
    om1col = pendS[...] + dterm + J1 * _ldn(qmt, 1)
    sm1gate = (c + 1 != ct).astype(F32)
    sm1 = om1col + sm1gate * sm * sm1S[...]
    sm1S[...] = sm1

    q2c1 = _onehot_read(q2[...], c + 1)
    obcol = q1pad[...] * col(fe) * q2c1
    obcol = obcol + col(fmb) * sm1

    def bm(b):
        src = c + 1 + b
        return ((c >= ct) | (src < ct)).astype(F32)

    OM = [OMb[b] * bm(b) for b in range(W)]
    OA = [OAb[b] * bm(b) for b in range(W)]

    gen = jnp.zeros((B, L), F32)
    for u1 in range(1, MAXLOOP):
        acc = None
        for b in range(1, MAXLOOP + 1 - u1):
            t = OM[b] * _at(w2k, u1, b)
            acc = t if acc is None else acc + t
        if acc is not None:
            gen = gen + _ldn(M5S[u1 + 1] * acc, u1 + 1)
    obcol = obcol + gen * col(minn)

    oa1 = OA[0]
    b5 = jnp.zeros((B, L), F32)
    for m in range(2, MAXLOOP + 1):
        b5 = b5 + bulge_k[:, m:m + 1] * _ldn(M5S[m + 1] * oa1, m + 1)
    b3 = jnp.zeros((B, L), F32)
    for b in range(2, W):
        b3 = b3 + OA[b] * bulge_k[:, b:b + 1]
    b3 = M5S[1] * b3
    obcol = obcol + col(taur) * (b5 + _ldn(b3, 1))

    for ref, di, dj in ((pstk1, 1, 1), (p111, 2, 2), (p21a1, 2, 3),
                        (p21b1, 3, 2), (p221, 3, 3), (pb151, 2, 1),
                        (pb131, 1, 2)):
        pc = jnp.where(c + dj < L, col(ref), 0.0)
        obcol = obcol + _ldn(pc * Ob[dj - 1], di)

    # exposed-segment adjoints
    qrow = qxT[jnp.minimum(c + 1, L - 1)]               # qx[c+1, :]
    hb = jnp.sum(_lup(vvecS[...], 1) * qrow, axis=1, keepdims=True)
    hb = hb + jnp.where(c + 1 < L, _onehot_read(vvecS[...], c + 1), 0.0)
    obcol = obcol + jnp.where(c >= ct, hb, 0.0) * col(fe) * qBprefS

    @pl.when(jnp.any((c + 1 == ct[:, 0]) & (ct[:, 0] > 0)))
    def _build_ga():
        wv = wvecS[...]
        inner = contract(qxT, _ldn(wv, 1))
        ga = _ldn(wv, 1) + _ldn(inner, 1)
        GAS[...] = jnp.where(c + 1 == ct, ga, GAS[...])

    qseg = _onehot_read(qxAS, c + 1)
    obcol = obcol + jnp.where(c < ct, qseg, 0.0) * col(fe) * GAS[...]
    obcol = _clamp(obcol)

    mlgate = (c != ct).astype(F32)
    a = M5S[1] * (obcol * col(fmc) * sg * sg * mlgate)
    ash = _ldn(a, 1)
    qm1_cm1 = jnp.where(c >= 1, col(qm1m), 0.0)
    w1 = _lup(qm1_cm1, 1) * _lup(J1, 1)
    w2_ = _lup(col(qm1c), 1) * _lup(J1, 1)
    if unroll:
        for m in range(L):
            omS[m] = omS[m] + ash * w1[:, m:m + 1] + omcol * w2_[:, m:m + 1]
    else:
        _scatter_rank1_scan(omS, ash, w1, omcol, w2_, L, B)

    qmt2 = contract(qmT, ash)
    pendS[...] = J1 * _ldn(qmt2, 1)

    vval = jnp.sum(obcol * col(fcx) * _lup(qxAS, 1), axis=1, keepdims=True)
    vval = jnp.where(c >= ct, vval, 0.0)
    vvecS[...] = jnp.where(lane == c, vval, vvecS[...])
    qxBr_c = _onehot_read(qBprefS, c)
    wvecS[...] = wvecS[...] + jnp.where(c >= ct, 1.0, 0.0) \
        * obcol * col(fcx) * qxBr_c

    Ob[...] = jnp.concatenate([obcol[None], Ob[:-1]], axis=0)
    OMb[...] = jnp.concatenate([(obcol * col(mout))[None], OMb[:-1]], axis=0)
    OAb[...] = jnp.concatenate([(obcol * col(tau))[None], OAb[:-1]], axis=0)
    ob_o[0] = obcol


def co_outside_pallas_streamed(factors_cbl, qmT, qm1_cbl, qxT, qxA, qBpref,
                               q1pad, q2, w2k, bulge_k, sig, pows, cut,
                               L: int, B: int, b_blk: int,
                               interpret: bool = False, unroll: bool = False):
    """Streamed outside pass.  qxT: qx in (L_i, B, L_cols) layout; qxA/qBpref
    precomputed [B, L] exterior-segment vectors.  Returns ob in column-stream
    (L_cols, B, L_i) layout."""
    assert unroll or L % 8 == 0, (
        f"streamed kernels contract in chunks of 8: pad L={L} to a "
        f"multiple of 8 (pipeline callers bucket to multiples of 32)")
    from .scan_pallas import _chunk_batch
    if b_blk < 8 and B > b_blk:
        return _chunk_batch(
            lambda cbl, row: (co_outside_pallas_streamed(
                cbl[:-3], cbl[-3], cbl[-2], cbl[-1], *row, L, b_blk, b_blk,
                interpret, unroll),),
            b_blk, B, tuple(factors_cbl) + (qmT, qm1_cbl, qxT),
            (qxA, qBpref, q1pad, q2, w2k, bulge_k, sig, pows, cut), 1)[0]
    nb = B // b_blk
    ccol = pl.BlockSpec((1, b_blk, L), lambda b, j: (L - 1 - j, b, 0))

    def ahead(dj):
        return pl.BlockSpec(
            (1, b_blk, L),
            lambda b, j: (jnp.minimum(L - 1 - j + dj, L - 1), b, 0))

    def fall(shape):
        return pl.BlockSpec(shape, lambda b, j: (b,) + (0,) * (len(shape) - 1))

    f = dict(zip(CO_FIELDS, factors_cbl))
    ins = [f["fe"], f["fmb"], f["fmc"], f["mout"], f["minn"], f["taur"],
           f["tau"], f["fcx"], f["pstk"], f["p11"], f["p21a"], f["p21b"],
           f["p22"], f["pb15"], f["pb13"], qm1_cbl, qm1_cbl, qmT, qxT,
           qxA, qBpref, q1pad, q2, w2k, bulge_k, sig, pows, cut]
    in_specs = ([ccol] * 8
                + [ahead(dj) for dj in (1, 2, 3, 2, 3, 1, 2)]
                + [ccol,
                   pl.BlockSpec((1, b_blk, L),
                                lambda b, j: (jnp.maximum(L - 2 - j, 0), b, 0)),
                   pl.BlockSpec((L, b_blk, L), lambda b, j: (0, b, 0)),
                   pl.BlockSpec((L, b_blk, L), lambda b, j: (0, b, 0)),
                   fall((b_blk, L)), fall((b_blk, L)),
                   fall((b_blk, L)), fall((b_blk, L + 1)),
                   fall((b_blk, W, W)), fall((b_blk, W)), fall((b_blk, 1)),
                   fall((b_blk, POW2)), fall((b_blk, 1))])

    return pl.pallas_call(
        functools.partial(_co_outside_kernel_streamed, L=L, B=b_blk,
                          unroll=unroll),
        grid=(nb, L),
        in_specs=in_specs,
        out_specs=ccol,
        out_shape=jax.ShapeDtypeStruct((L, B, L), F32),
        scratch_shapes=[
            pltpu.VMEM((L, b_blk, L), F32),     # omS
            pltpu.VMEM((W, b_blk, L), F32),     # Ob
            pltpu.VMEM((W, b_blk, L), F32),     # OMb
            pltpu.VMEM((W, b_blk, L), F32),     # OAb
            pltpu.VMEM((b_blk, L), F32),        # pendS
            pltpu.VMEM((b_blk, L), F32),        # sm1S
            pltpu.VMEM((b_blk, L), F32),        # vvecS
            pltpu.VMEM((b_blk, L), F32),        # wvecS
            pltpu.VMEM((b_blk, L), F32),        # GAS
            pltpu.VMEM((W + 2, b_blk, L), F32),  # M5S
            pltpu.VMEM((b_blk, L), F32),        # J1S
        ],
        interpret=interpret,
    )(*ins)


def _co_streamed_b_blk(L: int) -> int:
    """b_blk keeping the three (L, b, L) resident f32 buffers of the streamed
    cofold outside pass (omS + qmT + qxT) within ~13 MB."""
    from .scan_pallas import _auto_b_blk
    return _auto_b_blk(L, 1 << 30, 12 * L * L, budget=13e6, b_max=8)


# --------------------------------------------------------------------------
# batched wrapper
# --------------------------------------------------------------------------

def _pack_concat(S1, S2, n1):
    """Per-instance concatenation S1[:n1] ++ S2 into one padded buffer."""
    L1, L2 = S1.shape[1], S2.shape[1]
    L = L1 + L2

    def one(s1, s2, m1):
        idx = jnp.arange(L)
        s2r = jnp.roll(jnp.concatenate([s2, jnp.zeros((L1,), s2.dtype)]), m1)
        return jnp.where(idx < m1,
                         jnp.concatenate([s1, jnp.zeros((L2,), s1.dtype)]),
                         s2r)

    return jax.vmap(one)(S1, S2, n1)


def _co_batch_factors(bt, S, n, cut, sig, allow=None,
                      transposed: bool = False) -> CoFactors:
    from .factors_mm import co_factors_mm
    oax = 1 if transposed else 0
    fn = lambda s, m, c, sg, al: co_factors_mm(bt, s, m, c, sg, al,
                                               transposed)
    if allow is None:
        return jax.vmap(lambda s, m, c, sg: fn(s, m, c, sg, None),
                        out_axes=oax)(S, n, cut, sig)
    return jax.vmap(fn, out_axes=oax)(S, n, cut, sig, allow)


def _co_inside_once(bt, S, n, cut, es, b_blk, interpret, allow,
                    emit_state: bool = False, streamed: bool = False):
    B, L = S.shape
    sig = jnp.exp(-jnp.asarray(es, F32) / F32(bt.kt))
    ffn = _co_batch_factors(bt, S, n, cut, sig, allow)
    ffc = _co_batch_factors(bt, S, n, cut, sig, allow, transposed=True)
    w2k, bulge_k, pows = _sig_tables(bt, sig)
    fcbl = tuple(getattr(ffc, f) for f in CO_FIELDS)
    cut2 = cut[:, None].astype(jnp.int32)
    qm1_c, qb_c, qm_c, qx_c, q1 = co_inside_pallas_streamed(
        fcbl, w2k, bulge_k, sig[:, None], pows, cut2, L, B, b_blk,
        interpret, unroll=not streamed)
    qb, qx = _from_cbl(qb_c), _from_cbl(qx_c)
    qm = _from_cbl(qm_c)
    qmT = jnp.transpose(qm, (1, 0, 2))
    if emit_state:
        qm1 = _from_cbl(qm1_c)
    else:
        # natural-layout qm/qm1 copies are only compared by the equivalence
        # tests; keep empty placeholders so the adaptive while_loop carry
        # stays well-defined
        qm = qm1 = jnp.zeros((B, 0, 0), F32)
    zn = jnp.take_along_axis(q1, jnp.maximum(n[:, None] - 1, 0), axis=1)[:, 0]
    qbe = qb * ffn.fe
    q2 = q2_pallas(qbe, sig[:, None], n[:, None].astype(jnp.int32), L, B,
                   b_blk, interpret)
    hi = F32(0.99 * HUGE)
    sat = (jnp.max(qb.reshape(B, -1), axis=1) >= hi) \
        | (jnp.max(qmT, axis=(0, 2)) >= hi) \
        | (jnp.max(qx.reshape(B, -1), axis=1) >= hi) \
        | (jnp.max(q1, axis=1) >= hi) | ~jnp.isfinite(zn)
    ins = CoInsideState(qb=qb, qm=qm, qm1=qm1, qx=qx, q1=q1, q2=q2, zn=zn,
                        sat=sat)
    aux = dict(ffc=ffc, qm1_c=qm1_c, qmT=qmT, w2k=w2k, bulge_k=bulge_k,
               pows=pows)
    return ins, ffn, sig, aux


def batch_cofold(params, S1, S2, n1, n2, b_blk: int | None = None,
                 max_iter: int = 8,
                 interpret: bool = False, allow=None, es0: float = SCALE_E0,
                 emit_state: bool = False, streamed: bool | None = None):
    """Batched joint fold of the concatenations; returns a dict with the
    batched CoInsideState, ob, bpp over the concatenation, and hp [B, L1, L2]
    (the reference's cross-cut hybridization posteriors).

    emit_state=True additionally materializes qm/qm1 in natural layout (the
    equivalence tests compare them); production folds skip them so the
    resident VMEM state supports concatenations up to L1+L2 ~ 300."""
    from .scan_pallas import _auto_b_blk
    bt = get_boltz(params)
    Lc = S1.shape[1] + S2.shape[1]
    if streamed is None:
        # the unrolled kernel's Mosaic stack exceeds scoped VMEM above
        # Lc=256 even at b_blk=8 (TPU-measured round 5), so the chunked
        # streamed variant takes over earlier than the fold kernel
        streamed = Lc > 256
    if b_blk is None:
        # 30*L^2 bytes/sublane: empirical fit (b=16 OOMs at Lc=192,
        # b=8 compiles at Lc=256)
        b_blk = (_co_streamed_b_blk(Lc) if streamed
                 else _auto_b_blk(Lc, S1.shape[0], 30 * Lc * Lc,
                                  budget=15e6))
    elif streamed:
        b_blk = min(b_blk, _co_streamed_b_blk(Lc))
    B0, L1 = S1.shape
    L2 = S2.shape[1]
    B = -(-B0 // b_blk) * b_blk
    S1 = _pad_batch(jnp.asarray(S1, jnp.int32), B)
    S2 = _pad_batch(jnp.asarray(S2, jnp.int32), B)
    n1 = jnp.maximum(_pad_batch(jnp.asarray(n1, jnp.int32), B), 1)
    n2 = jnp.maximum(_pad_batch(jnp.asarray(n2, jnp.int32), B), 1)
    if allow is not None:
        allow = _pad_batch(jnp.asarray(allow, bool), B)
    S = _pack_concat(S1, S2, n1)
    n = n1 + n2
    cut = n1
    L = L1 + L2
    kt = F32(bt.kt)
    nf = jnp.maximum(n.astype(F32), 1.0)

    es = jnp.full((B,), es0, F32)
    ins, ffn, sig, aux = _co_inside_once(bt, S, n, cut, es, b_blk, interpret,
                                         allow, emit_state, streamed)

    def good(ins):
        return (~ins.sat) & (ins.zn > ZLO) & (ins.zn < ZHI) \
            & jnp.isfinite(ins.zn)

    def cond(c):
        es, ins, aux, it = c
        return (it < max_iter) & jnp.any(~good(ins))

    def body(c):
        es, ins, aux, it = c
        step = kt * 60.0 / nf
        bad_hi = ins.sat | ~jnp.isfinite(ins.zn) | (ins.zn >= ZHI)
        es2 = jnp.where(bad_hi, es + step,
                        jnp.where(ins.zn > 0,
                                  es + kt * jnp.log(ins.zn) / nf, es - step))
        es2 = jnp.where(good(ins), es, es2)
        ins2, _, _, aux2 = _co_inside_once(bt, S, n, cut, es2, b_blk,
                                           interpret, allow, emit_state,
                                           streamed)
        return (es2, ins2, aux2, it + 1)

    es, ins, aux, _ = jax.lax.while_loop(cond, body,
                                         (es, ins, aux, jnp.int32(0)))
    sig = jnp.exp(-es / kt)
    fcbl = tuple(getattr(aux["ffc"], f) for f in CO_FIELDS)
    q1pad = jnp.concatenate([jnp.ones((B, 1), F32), ins.q1[:, :-1]], axis=1)
    cut2 = cut[:, None].astype(jnp.int32)
    # precomputed exterior-segment vectors: qxA[p] = qx[p, cut-1],
    # qBpref[k] = qx[cut, k-1]
    lanes = jnp.arange(L)[None, :]
    qxa = jnp.take_along_axis(
        ins.qx, jnp.maximum(cut - 1, 0)[:, None, None]
        * jnp.ones((1, L, 1), jnp.int32), axis=2)[:, :, 0]
    qxA = jnp.where(lanes < cut[:, None], qxa,
                    jnp.where(lanes == cut[:, None], 1.0, 0.0))
    qbrow = jnp.take_along_axis(
        ins.qx, jnp.minimum(cut, L - 1)[:, None, None]
        * jnp.ones((1, 1, L), jnp.int32), axis=1)[:, 0, :]
    qbp = jnp.where(lanes == cut[:, None], 1.0,
                    jnp.concatenate([jnp.zeros((B, 1), F32),
                                     qbrow[:, :-1]], axis=1))
    qBpref = jnp.where(lanes >= cut[:, None], qbp, 0.0)
    qxT = jnp.transpose(ins.qx, (1, 0, 2))
    ob_c = co_outside_pallas_streamed(
        fcbl, aux["qmT"], aux["qm1_c"], qxT, qxA, qBpref, q1pad, ins.q2,
        aux["w2k"], aux["bulge_k"], sig[:, None], aux["pows"], cut2,
        L, B, b_blk, interpret, unroll=not streamed)
    ob = _from_cbl(ob_c)
    zn = ins.zn
    bpp = jnp.where(zn[:, None, None] > 0, ins.qb * ob / zn[:, None, None],
                    0.0)

    # hp[i1, i2] = bpp[i1, n1 + i2] (cross block), masked to real lengths
    def extract(bppi, m1, m2):
        cols = m1 + jnp.arange(L2)[None, :]
        rows = jnp.arange(L1)[:, None]
        hp = bppi[rows, jnp.clip(cols, 0, L - 1)]
        return jnp.where((rows < m1) & (jnp.arange(L2)[None, :] < m2), hp,
                         0.0)

    hp = jax.vmap(extract)(bpp, n1, n2)
    sl = lambda t: t[:B0]
    return dict(ins=jax.tree_util.tree_map(sl, ins), ob=sl(ob), bpp=sl(bpp),
                hp=sl(hp), sig=sl(sig), es=sl(es))
