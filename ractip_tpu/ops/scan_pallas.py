"""Pallas TPU megakernels for the McCaskill column-scan DPs.

Why a kernel: the jnp inside/outside passes (ops.mccaskill) execute the O(n^3)
recurrence as a fori_loop of ~100 small XLA ops per column; on TPU each column
costs ~ms of per-op dispatch overhead, so a 96nt batch-of-128 inside pass
measures ~250 ms while its arithmetic is worth ~1 ms.  These kernels run the
ENTIRE column scan on-core: all DP state lives in VMEM scratch across grid
steps, per-column Boltzmann-factor columns are streamed from HBM by the Pallas
pipeline, and each recurrence term is a handful of VPU ops on [B_blk, L]
tiles (batch in sublanes, sequence position in lanes).

Layout contract
---------------
* streamed matrices (factors, qm1 for the outside pass, ALL [B, L, L]
  outputs) use the column-first layout (L_cols, B, L_i): BlockSpec
  (1, b_blk, L) satisfies the Mosaic rule that a block's last two dims are
  (multiple-of-8, full-dim) and delivers/commits column j as a [b_blk, L]
  tile per grid step; natural [B, L_i, L_cols] layouts are restored by ONE
  XLA transpose outside the kernel (measured round 5: streaming outputs
  instead of resident dual-layout blocks + per-column lane blends is ~10%
  faster AND frees the VMEM that previously capped b_blk at 8);
* the in-kernel resident qm is scratch (L_cols, b_blk, L_i) so contractions
  read qmS[l] via a static leading index -- for short L the sums over l are
  STATICALLY UNROLLED (unroll=True; the body is one column, so the unroll
  compiles once and runs for every grid step); for long L they run as
  chunked fori_loops whose compile time stays flat in L;
* per-instance values (sigma, the w2/bulge kernels, (sigma*ml_base)^(2^k))
  are [B, ...] inputs broadcast across lanes;
* b_blk (batch sublane depth per grid step) is auto-chosen by _auto_b_blk:
  deeper blocks amortize per-grid-step pipeline overhead against the
  Mosaic scoped-VMEM ceiling.

Semantics are IDENTICAL to ops.mccaskill.inside/outside (probability source
of the reference: Vienna pf_fold with BL* tables, reference
src/ractip.cpp:248-306); tests/test_scan_pallas.py asserts agreement with the
jnp path in interpret mode; tools/tpu_smoke_scan.py re-asserts it on TPU.
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
from .mccaskill import (HUGE, SCALE_E0, W, ZHI, ZLO, FoldFactors, InsideState)

FACTOR_FIELDS = FoldFactors._fields           # 15 names, fixed order
POW2 = 11                                     # doubling steps; covers L<=2048
F32 = jnp.float32


# --------------------------------------------------------------------------
# lane-axis helpers ([B, L] tiles: batch in sublanes, position in lanes)
# --------------------------------------------------------------------------

def _lup(t: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[..., i] = t[..., i+k], zero fill (static k)."""
    if k == 0:
        return t
    return jnp.concatenate([t[..., k:], jnp.zeros_like(t[..., :k])], axis=-1)


def _ldn(t: jnp.ndarray, k: int) -> jnp.ndarray:
    if k == 0:
        return t
    return jnp.concatenate([jnp.zeros_like(t[..., :k]), t[..., :-k]], axis=-1)


def _lane_iota(shape) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _suffix_scan(v: jnp.ndarray, pows, L: int) -> jnp.ndarray:
    """y[i] = sum_{k>=i} a^(k-i) v[k] along lanes; pows[:, s] = a^(2^s)."""
    y = v
    s = 1
    for idx in range(POW2):
        if s >= L:
            break
        y = y + pows[:, idx:idx + 1] * _lup(y, s)
        s *= 2
    return y


def _prefix_scan(v: jnp.ndarray, pows, L: int) -> jnp.ndarray:
    """y[i] = sum_{k<=i} a^(i-k) v[k] along lanes."""
    y = v
    s = 1
    for idx in range(POW2):
        if s >= L:
            break
        y = y + pows[:, idx:idx + 1] * _ldn(y, s)
        s *= 2
    return y


def _clamp(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(t, F32(HUGE))


def _at(ref3, a: int, b: int) -> jnp.ndarray:
    """ref3[:, a, b] -> [B, 1] (static indices)."""
    return ref3[:, a, b][:, None]


def _to_cbl(m: jnp.ndarray) -> jnp.ndarray:
    """[B, L_i, L_cols] -> (L_cols, B, L_i)."""
    return jnp.transpose(m, (2, 0, 1))


def _from_cbl(m: jnp.ndarray) -> jnp.ndarray:
    """(L_cols, B, L_i) -> [B, L_i, L_cols]."""
    return jnp.transpose(m, (1, 2, 0))


# --------------------------------------------------------------------------
# q2 (exterior suffix) kernel
# --------------------------------------------------------------------------

def _q2_kernel(qbe, sig, n, q2_o, q2S, *, L: int, B: int):
    q2S[...] = jnp.ones_like(q2S)
    lane = _lane_iota((B, L + 1))
    sg = sig[:, 0:1]

    def body(k, _):
        i = L - 1 - k
        row = qbe[:, i, :]                      # [B, L] (dynamic sublane idx)
        s = jnp.sum(row * _lup(q2S[...], 1)[:, :L], axis=1, keepdims=True)
        nxt = jnp.sum(jnp.where(lane == i + 1, q2S[...], 0.0), axis=1,
                      keepdims=True)
        val = jnp.where(i >= n[:, 0:1], 1.0, _clamp(sg * nxt + s))
        q2S[...] = jnp.where(lane == i, val, q2S[...])
        return 0

    jax.lax.fori_loop(0, L, body, 0)
    q2_o[...] = q2S[...]


def q2_pallas(qbe, sig, n, L: int, B: int, b_blk: int = 8,
              interpret: bool = False):
    if b_blk < 8 and B > b_blk:
        # Mosaic block-shape rule: see _chunk_batch
        return jnp.concatenate(
            [q2_pallas(qbe[s:s + b_blk], sig[s:s + b_blk], n[s:s + b_blk],
                       L, b_blk, b_blk, interpret)
             for s in range(0, B, b_blk)], axis=0)
    nb = B // b_blk
    return pl.pallas_call(
        functools.partial(_q2_kernel, L=L, B=b_blk),
        grid=(nb,),
        in_specs=[pl.BlockSpec((b_blk, L, L), lambda b: (b, 0, 0)),
                  pl.BlockSpec((b_blk, 1), lambda b: (b, 0)),
                  pl.BlockSpec((b_blk, 1), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((b_blk, L + 1), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L + 1), F32),
        scratch_shapes=[pltpu.VMEM((b_blk, L + 1), F32)],
        interpret=interpret,
    )(qbe, sig, n)


# --------------------------------------------------------------------------
# inside / outside kernels
#
# One kernel pair serves all lengths; the `unroll` flag selects how the
# O(L) per-column contractions against the resident qm/om scratch run:
#   * unroll=True (short L, the default dispatch for L <= 256): L-deep
#     static unrolls -- fastest, but compile time and Mosaic stack grow
#     with L;
#   * unroll=False (long L): fori_loop chunks with dynamic leading-dim
#     scratch slices and a lane-rotation (pltpu.roll) to extract the
#     running scalar, so compile time stays flat in L and b_blk scales
#     down with L (8 at 384nt, 1 at 1024nt) instead of hitting a wall.
# Every [B, L, L] output leaves the core as a per-column stream (BlockSpec
# (1, b_blk, L)); natural layouts are restored by ONE XLA transpose outside.
# --------------------------------------------------------------------------

_CH = 8                                       # contraction chunk (leading dim)


def _roll_left1(v: jnp.ndarray) -> jnp.ndarray:
    """Rotate lanes left by one: out[..., i] = v[..., (i+1) % L].

    pltpu.roll only accepts non-negative shifts (which rotate RIGHT), so a
    left rotation by 1 is a right rotation by L-1."""
    return pltpu.roll(v, v.shape[-1] - 1, v.ndim - 1)


def _contract_scan(ref, v, L: int, B: int):
    """acc[b, i] = sum_l ref[l, b, i] * v[b, l] via chunked fori_loop.

    ref: VMEM scratch/input (L, B, L); v: [B, L] with l on LANES.  Rolls v
    left one lane per step so the current scalar is always lane 0."""

    def chunk(c, carry):
        acc, vr = carry
        blk = ref[pl.ds(c * _CH, _CH)]
        for cc in range(_CH):
            acc = acc + blk[cc] * vr[:, 0:1]
            vr = _roll_left1(vr)
        return acc, vr

    acc, _ = jax.lax.fori_loop(
        0, L // _CH, chunk, (jnp.zeros((B, L), F32), v))
    return acc


def _scatter_rank1_scan(ref, u1, w1, u2, w2, L: int, B: int):
    """ref[m] += u1 * w1[:, m] + u2 * w2[:, m] for all m (chunked)."""

    def chunk(c, carry):
        w1r, w2r = carry
        base = c * _CH
        blk = ref[pl.ds(base, _CH)]
        rows = []
        for cc in range(_CH):
            rows.append(blk[cc] + u1 * w1r[:, 0:1] + u2 * w2r[:, 0:1])
            w1r = _roll_left1(w1r)
            w2r = _roll_left1(w2r)
        ref[pl.ds(base, _CH)] = jnp.concatenate(
            [r[None] for r in rows], axis=0)
        return w1r, w2r

    jax.lax.fori_loop(0, L // _CH, chunk, (w1, w2))


def _inside_kernel_streamed(
        fhn, pstk, p11, p21a, p21b, p22, pb15, pb13, tau, taur, mout, minn,
        fmb, fmc, fe,                           # factor column refs (1, B, L)
        w2k, bulge_k, sig, pows,
        qm1c_o, qb_o, qm_o, qm2_o,              # column streams (1, B, L)
        q1_o,                                   # resident (B, L)
        qmS, Qb, Mb, Ab, qm1P, q1S,             # scratch
        *, L: int, B: int, unroll: bool = False):
    j = pl.program_id(1)

    def contract(v):
        # acc[b, i] = sum_l qmS[l, b, i] * v[b, l]; the callers pass v
        # shifted up one lane, so v[:, L-1] == 0 and the unrolled sum may
        # stop at L-2.  unroll=True (short L) trades code size for the
        # dynamic-slice + lane-roll cost of the chunked scan, which
        # dominates at L <= 256 (see RESULTS round 5).
        if not unroll:
            return _contract_scan(qmS, v, L, B)
        acc = jnp.zeros((B, L), F32)
        for l in range(L - 1):
            acc = acc + qmS[l] * v[:, l:l + 1]
        return acc

    @pl.when(j == 0)
    def _init():
        qmS[...] = jnp.zeros_like(qmS)
        Qb[...] = jnp.zeros_like(Qb)
        Mb[...] = jnp.zeros_like(Mb)
        Ab[...] = jnp.zeros_like(Ab)
        qm1P[...] = jnp.zeros_like(qm1P)
        q1S[...] = jnp.zeros_like(q1S)

    col = lambda r: r[0]
    sg = sig[:, 0:1]
    sm = pows[:, 0:1]

    X = [Qb[b] * Mb[b] for b in range(W)]
    A = [Qb[b] * Ab[b] for b in range(W)]

    gen = jnp.zeros((B, L), F32)
    for u1 in range(1, MAXLOOP):
        acc = None
        for b in range(u1, W - 1):
            t = X[b] * _at(w2k, u1, W - 1 - b)
            acc = t if acc is None else acc + t
        if acc is not None:
            gen = gen + _lup(acc, u1 + 1)
    gen = gen * col(mout)

    acol = A[W - 1]
    b5 = jnp.zeros((B, L), F32)
    for m in range(2, MAXLOOP + 1):
        b5 = b5 + bulge_k[:, m:m + 1] * _lup(acol, m + 1)
    b3 = jnp.zeros((B, L), F32)
    for b in range(0, W - 2):
        b3 = b3 + A[b] * bulge_k[:, W - 1 - b:W - b]
    bulges = col(tau) * (b5 + _lup(b3, 1))

    # multiloop closing: qm2col[i] = sum_l qmS[l, :, i] * qm1_prev[:, l+1]
    qm2col = _clamp(contract(_lup(qm1P[...], 1)))

    qbcol = (col(fhn) + gen + bulges
             + col(pstk) * _lup(Qb[W - 1], 1)
             + col(p11) * _lup(Qb[W - 2], 2)
             + col(p21a) * _lup(Qb[W - 3], 2)
             + col(p21b) * _lup(Qb[W - 2], 3)
             + col(p22) * _lup(Qb[W - 3], 3)
             + col(pb15) * _lup(Qb[W - 1], 2)
             + col(pb13) * _lup(Qb[W - 2], 1)
             + col(fmc) * sg * sg * _lup(qm2col, 1))
    qbcol = _clamp(qbcol)

    qm1col = _clamp(sm * qm1P[...] + qbcol * col(fmb))
    ml2 = contract(_lup(qm1col, 1))
    qmcol = _clamp(_suffix_scan(qm1col, pows, L) + ml2)

    lane = _lane_iota((B, L))
    q1_prev = jnp.sum(jnp.where(lane == j - 1, q1S[...], 0.0), axis=1,
                      keepdims=True)
    q1_prev = jnp.where(j >= 1, q1_prev, 1.0)
    q1pad = jnp.where(lane == 0, 1.0, _ldn(q1S[...], 1))
    q1val = _clamp(sg * q1_prev
                   + jnp.sum(q1pad * qbcol * col(fe), axis=1, keepdims=True))
    q1S[...] = jnp.where(lane == j, q1val, q1S[...])

    qmS[j] = qmcol
    Qb[...] = jnp.concatenate([Qb[1:], qbcol[None]], axis=0)
    Mb[...] = jnp.concatenate([Mb[1:], col(minn)[None]], axis=0)
    Ab[...] = jnp.concatenate([Ab[1:], col(taur)[None]], axis=0)
    qm1P[...] = qm1col

    qm1c_o[0] = qm1col
    qb_o[0] = qbcol
    qm_o[0] = qmcol
    qm2_o[0] = qm2col                # stream block index = max(j-1, 0)
    q1_o[...] = q1S[...]


def _chunk_batch(call_one, b_blk: int, B: int, cbl_ins, row_ins, n_cbl_outs):
    """Mosaic requires a block's second-to-last dim to be a multiple of 8 OR
    the full array dim.  When the VMEM budget forces b_blk < 8, slice the
    batch into b_blk-sized chunks and run one pallas_call per chunk (inside
    each call the block batch dim == the full batch dim, which is legal);
    outputs are concatenated back.  cbl_ins have batch on axis 1, row_ins on
    axis 0; the first n_cbl_outs outputs are (L, B, L), the rest (B, ...)."""
    outs = []
    for s in range(0, B, b_blk):
        outs.append(call_one(
            tuple(a[:, s:s + b_blk] for a in cbl_ins),
            tuple(a[s:s + b_blk] for a in row_ins)))
    joined = []
    for k in range(len(outs[0])):
        ax = 1 if k < n_cbl_outs else 0
        joined.append(jnp.concatenate([o[k] for o in outs], axis=ax))
    return tuple(joined)


def inside_pallas_streamed(factors_cbl, w2k, bulge_k, sig, pows, L: int,
                           B: int, b_blk: int, interpret: bool = False,
                           unroll: bool = False):
    """Streamed-output inside pass: returns (qm1_c, qb_c, qm_c, qm2_c, q1)
    with the first four in column-stream (L_cols, B, L_i) layout.  qm2_c's
    column L-1 is never written (the caller fills it).  unroll=True
    statically unrolls the multiloop contractions (fast for short L)."""
    assert unroll or L % _CH == 0, (
        f"streamed kernels contract in chunks of {_CH}: pad L={L} to a "
        f"multiple of {_CH} (pipeline callers bucket to multiples of 32)")
    if b_blk < 8 and B > b_blk:
        return _chunk_batch(
            lambda cbl, row: inside_pallas_streamed(
                cbl, *row, L, b_blk, b_blk, interpret, unroll),
            b_blk, B, tuple(factors_cbl), (w2k, bulge_k, sig, pows), 4)
    nb = B // b_blk
    fcol = pl.BlockSpec((1, b_blk, L), lambda b, j: (j, b, 0))
    qm2col_spec = pl.BlockSpec((1, b_blk, L),
                               lambda b, j: (jnp.maximum(j - 1, 0), b, 0))

    def fall(shape):
        return pl.BlockSpec(shape, lambda b, j: (b,) + (0,) * (len(shape) - 1))

    cmat = jax.ShapeDtypeStruct((L, B, L), F32)
    return pl.pallas_call(
        functools.partial(_inside_kernel_streamed, L=L, B=b_blk,
                          unroll=unroll),
        grid=(nb, L),
        in_specs=[fcol] * 15 + [fall((b_blk, W, W)), fall((b_blk, W)),
                                fall((b_blk, 1)), fall((b_blk, POW2))],
        out_specs=(fcol, fcol, fcol, qm2col_spec,
                   pl.BlockSpec((b_blk, L), lambda b, j: (b, 0))),
        out_shape=(cmat, cmat, cmat, cmat,
                   jax.ShapeDtypeStruct((B, L), F32)),
        scratch_shapes=[
            pltpu.VMEM((L, b_blk, L), F32),     # qmS
            pltpu.VMEM((W, b_blk, L), F32),     # Qb
            pltpu.VMEM((W, b_blk, L), F32),     # Mb
            pltpu.VMEM((W, b_blk, L), F32),     # Ab
            pltpu.VMEM((b_blk, L), F32),        # qm1P
            pltpu.VMEM((b_blk, L), F32),        # q1S
        ],
        interpret=interpret,
    )(*factors_cbl, w2k, bulge_k, sig, pows)


def _outside_kernel_streamed(
        fe, fmb, fmc, mout, minn, taur, tau,
        pstk1, p111, p21a1, p21b1, p221, pb151, pb131,
        qm1c, qm1m,
        qmT, q1pad, q2,
        w2k, bulge_k, sig, pows,
        ob_o,                                   # column stream (1, B, L)
        omS, Ob, OMb, OAb, pendS, sm1S,
        *, L: int, B: int, unroll: bool = False):
    j = pl.program_id(1)
    c = L - 1 - j

    def contract_qmT(v):
        # acc[b, i] = sum_l qmT[l, b, i] * v[b, l] over the FULL l range
        # (v is not shifted here, so lane L-1 contributes).
        if not unroll:
            return _contract_scan(qmT, v, L, B)
        acc = jnp.zeros((B, L), F32)
        for i in range(L):
            acc = acc + qmT[i] * v[:, i:i + 1]
        return acc

    @pl.when(j == 0)
    def _init():
        omS[...] = jnp.zeros_like(omS)
        Ob[...] = jnp.zeros_like(Ob)
        OMb[...] = jnp.zeros_like(OMb)
        OAb[...] = jnp.zeros_like(OAb)
        pendS[...] = jnp.zeros_like(pendS)
        sm1S[...] = jnp.zeros_like(sm1S)

    col = lambda r: r[0]
    sg = sig[:, 0:1]
    sm = pows[:, 0:1]

    omcol = omS[c]
    qmt = contract_qmT(omcol)
    om1col = pendS[...] + _prefix_scan(omcol, pows, L) + _ldn(qmt, 1)
    sm1 = om1col + sm * sm1S[...]
    sm1S[...] = sm1

    lane2 = _lane_iota((B, L + 1))
    q2c1 = jnp.sum(jnp.where(lane2 == c + 1, q2[...], 0.0), axis=1,
                   keepdims=True)
    obcol = q1pad[...] * col(fe) * q2c1
    obcol = obcol + col(fmb) * sm1

    gen = jnp.zeros((B, L), F32)
    for u1 in range(1, MAXLOOP):
        acc = None
        for b in range(1, MAXLOOP + 1 - u1):
            t = OMb[b] * _at(w2k, u1, b)
            acc = t if acc is None else acc + t
        if acc is not None:
            gen = gen + _ldn(acc, u1 + 1)
    obcol = obcol + gen * col(minn)

    oa1 = OAb[0]
    b5 = jnp.zeros((B, L), F32)
    for m in range(2, MAXLOOP + 1):
        b5 = b5 + bulge_k[:, m:m + 1] * _ldn(oa1, m + 1)
    b3 = jnp.zeros((B, L), F32)
    for b in range(2, W):
        b3 = b3 + OAb[b] * bulge_k[:, b:b + 1]
    obcol = obcol + col(taur) * (b5 + _ldn(b3, 1))

    for ref, di, dj in ((pstk1, 1, 1), (p111, 2, 2), (p21a1, 2, 3),
                        (p21b1, 3, 2), (p221, 3, 3), (pb151, 2, 1),
                        (pb131, 1, 2)):
        pc = jnp.where(c + dj < L, col(ref), 0.0)
        obcol = obcol + _ldn(pc * Ob[dj - 1], di)
    obcol = _clamp(obcol)

    a = obcol * col(fmc) * sg * sg
    ash = _ldn(a, 1)
    qm1_cm1 = jnp.where(c >= 1, col(qm1m), 0.0)
    w1 = _lup(qm1_cm1, 1)
    w2_ = _lup(col(qm1c), 1)
    if unroll:
        for m in range(L):
            omS[m] = omS[m] + ash * w1[:, m:m + 1] + omcol * w2_[:, m:m + 1]
    else:
        _scatter_rank1_scan(omS, ash, w1, omcol, w2_, L, B)

    qmt2 = contract_qmT(ash)
    pendS[...] = _ldn(qmt2, 1)

    Ob[...] = jnp.concatenate([obcol[None], Ob[:-1]], axis=0)
    OMb[...] = jnp.concatenate([(obcol * col(mout))[None], OMb[:-1]], axis=0)
    OAb[...] = jnp.concatenate([(obcol * col(tau))[None], OAb[:-1]], axis=0)
    ob_o[0] = obcol


def outside_pallas_streamed(factors_cbl, qmT, qm1_cbl, q1pad, q2, w2k,
                            bulge_k, sig, pows, L: int, B: int, b_blk: int,
                            interpret: bool = False, unroll: bool = False):
    """Streamed outside pass -> ob in column-stream (L_cols, B, L_i) layout."""
    assert unroll or L % _CH == 0, (
        f"streamed kernels contract in chunks of {_CH}: pad L={L} to a "
        f"multiple of {_CH} (pipeline callers bucket to multiples of 32)")
    if b_blk < 8 and B > b_blk:
        return _chunk_batch(
            lambda cbl, row: (outside_pallas_streamed(
                cbl[:-2], cbl[-2], cbl[-1], *row, L, b_blk, b_blk,
                interpret, unroll),),
            b_blk, B, tuple(factors_cbl) + (qmT, qm1_cbl),
            (q1pad, q2, w2k, bulge_k, sig, pows), 1)[0]
    nb = B // b_blk
    ccol = pl.BlockSpec((1, b_blk, L), lambda b, j: (L - 1 - j, b, 0))

    def ahead(dj):
        return pl.BlockSpec(
            (1, b_blk, L),
            lambda b, j: (jnp.minimum(L - 1 - j + dj, L - 1), b, 0))

    def fall(shape):
        return pl.BlockSpec(shape, lambda b, j: (b,) + (0,) * (len(shape) - 1))

    f = dict(zip(FACTOR_FIELDS, factors_cbl))
    ins = [f["fe"], f["fmb"], f["fmc"], f["mout"], f["minn"], f["taur"],
           f["tau"], f["pstk"], f["p11"], f["p21a"], f["p21b"], f["p22"],
           f["pb15"], f["pb13"], qm1_cbl, qm1_cbl, qmT, q1pad, q2,
           w2k, bulge_k, sig, pows]
    in_specs = ([ccol] * 7
                + [ahead(dj) for dj in (1, 2, 3, 2, 3, 1, 2)]
                + [ccol,
                   pl.BlockSpec((1, b_blk, L),
                                lambda b, j: (jnp.maximum(L - 2 - j, 0), b, 0)),
                   pl.BlockSpec((L, b_blk, L), lambda b, j: (0, b, 0)),
                   fall((b_blk, L)), fall((b_blk, L + 1)),
                   fall((b_blk, W, W)), fall((b_blk, W)), fall((b_blk, 1)),
                   fall((b_blk, POW2))])

    return pl.pallas_call(
        functools.partial(_outside_kernel_streamed, L=L, B=b_blk,
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
        ],
        interpret=interpret,
    )(*ins)


def _auto_b_blk(L: int, B: int, bytes_per_b: float, budget: float = 12e6,
                b_max: int = 32) -> int:
    """Pick the batch-block depth: the largest power-of-two b_blk <= b_max
    that (a) above 8 does not pad the batch past its next multiple of 8 and
    (b) keeps the kernels' resident VMEM (bytes_per_b * b_blk) within
    budget.  Deeper blocks amortize the per-grid-step pipeline overhead
    (measured round 5: 33.8 -> 26.4 ms/fold at the bench shape going
    8 -> 32), at 4 sublane-tiles per VPU op instead of 1."""
    cap = max(8, -(-B // 8) * 8)
    b = b_max
    while b > 8 and (b > cap or bytes_per_b * b > budget):
        b //= 2
    while b > 1 and bytes_per_b * b > budget:
        b //= 2
    return b


def _streamed_b_blk(L: int) -> int:
    """VMEM-safe b_blk cap for the chunked-contraction (long-L) kernels:
    the two (L, b, L) resident f32 buffers of the outside pass must stay
    within ~12 MB."""
    return _auto_b_blk(L, 1 << 30, 8 * L * L, b_max=8)


# --------------------------------------------------------------------------
# batched wrapper: factors + adaptive scaling + inside/outside/q2
# --------------------------------------------------------------------------

def _sig_tables(bt: BoltzTables, sig, dtype=F32):
    """Per-instance w2/bulge kernels + smlb powers ([B, ...])."""
    sig = jnp.asarray(sig, dtype)
    smlb = sig * jnp.asarray(bt.ml_base, dtype)
    e2 = jnp.asarray(np.add.outer(np.arange(W), np.arange(W)) + 2, dtype)
    w2k = jnp.asarray(bt.w2_raw, dtype)[None] * sig[:, None, None] ** e2[None]
    em = jnp.asarray(np.arange(MAXLOOP + 1) + 2, dtype)
    bulge_k = jnp.asarray(bt.bulge_raw, dtype)[None] * sig[:, None] ** em[None]
    pows = smlb[:, None] ** jnp.asarray(2.0 ** np.arange(POW2), dtype)[None]
    return w2k, bulge_k, pows


def _batch_factors(bt: BoltzTables, S, n, sig, allow=None,
                   transposed: bool = False) -> FoldFactors:
    """Batched factor matrices via bilinear matmuls (ops.factors_mm).

    transposed=True emits each factor in (L_cols, B, L_i) layout (out_axes=1)
    -- the streaming layout of the Pallas kernels, with no XLA transposes."""
    from .factors_mm import fold_factors_mm
    oax = 1 if transposed else 0
    fn = lambda s, m, sg, al: fold_factors_mm(bt, s, m, sg, al, transposed)
    if allow is None:
        return jax.vmap(lambda s, m, sg: fn(s, m, sg, None),
                        out_axes=oax)(S, n, sig)
    return jax.vmap(fn, out_axes=oax)(S, n, sig, allow)


def _pad_batch(x, B_pad):
    if x.shape[0] == B_pad:
        return x
    pad = [(0, B_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def batch_inside(params_or_bt, S, n, es, b_blk: int = 8,
                 interpret: bool = False, allow=None,
                 streamed: bool | None = None):
    """One batched inside pass at per-instance scale energies es [B].

    Returns (InsideState of natural [B, ...] arrays, aux dict with the
    kernel-layout tensors the outside pass consumes, sig [B]).  streamed=None
    auto-selects the streamed-state kernel variant for L > 256."""
    bt = params_or_bt if isinstance(params_or_bt, BoltzTables) \
        else get_boltz(params_or_bt)
    B, L = S.shape
    if streamed is None:
        streamed = L > 256
    if streamed:
        b_blk = min(b_blk, _streamed_b_blk(L))
    sig = jnp.exp(-jnp.asarray(es, F32) / F32(bt.kt))
    ffn = _batch_factors(bt, S, n, sig, allow)
    ffc = _batch_factors(bt, S, n, sig, allow, transposed=True)
    w2k, bulge_k, pows = _sig_tables(bt, sig)
    fcbl = tuple(getattr(ffc, f) for f in FACTOR_FIELDS)
    qm1_c, qb_c, qm_c, qm2_c, q1 = inside_pallas_streamed(
        fcbl, w2k, bulge_k, sig[:, None], pows, L, B, b_blk, interpret,
        unroll=not streamed)
    qb, qm, qm1 = _from_cbl(qb_c), _from_cbl(qm_c), _from_cbl(qm1_c)
    qm2 = _from_cbl(qm2_c)
    # column L-1 of the qm2 stream is never written; zero it (the caller
    # overwrite below recomputes it exactly as ops.mccaskill.inside does)
    qm2 = qm2.at[:, :, L - 1].set(0.0)
    qmT = jnp.transpose(qm, (1, 0, 2))
    # last qm2 column (segment ending at L-1), as in ops.mccaskill.inside
    v = jnp.concatenate([qm1[:, 1:, L - 1], jnp.zeros((B, 1), F32)], axis=1)
    qm2 = qm2.at[:, :, L - 1].set(jnp.einsum("ibl,bl->bi", qmT, v))
    zn = jnp.take_along_axis(q1, jnp.maximum(n[:, None] - 1, 0),
                             axis=1)[:, 0]
    qbe = qb * ffn.fe
    q2 = q2_pallas(qbe, sig[:, None], n[:, None].astype(jnp.int32), L, B,
                   b_blk, interpret)
    hi = F32(0.99 * HUGE)
    sat = (jnp.max(qb.reshape(B, -1), axis=1) >= hi) \
        | (jnp.max(qm.reshape(B, -1), axis=1) >= hi) \
        | (jnp.max(q1, axis=1) >= hi) | ~jnp.isfinite(zn)
    ins = InsideState(qb=qb, qm=qm, qm1=qm1, qm2=qm2, q1=q1, q2=q2, zn=zn,
                      sat=sat)
    aux = dict(ffn=ffn, ffc=ffc, qm1_c=qm1_c, qmT=qmT, w2k=w2k,
               bulge_k=bulge_k, pows=pows)
    return ins, aux, sig


def batch_fold(params, S, n, b_blk: int | None = None, max_iter: int = 8,
               interpret: bool = False, allow=None, es0: float = SCALE_E0):
    """Batched inside+outside with per-instance adaptive pf scaling.

    S [B, L] int32 encodings, n [B] lengths.  Returns a dict with the batched
    InsideState, FoldFactors, ob, bpp [B, L, L], sigma [B], es [B].  B is
    padded to a multiple of b_blk internally.  b_blk=None auto-selects 8
    (shrinking for long L so the resident DP state + dual-layout output
    blocks stay inside the 16 MB VMEM budget).
    """
    bt = get_boltz(params)
    L = S.shape[1]
    streamed = L > 256
    if b_blk is None:
        # 12*L^2 bytes/sublane, 14.5 MB: empirical fit of the Mosaic scoped-
        # vmem ceiling (TPU-measured round 5: b=32 compiles at L<=192,
        # b=16 at L=256)
        b_blk = (_streamed_b_blk(L) if streamed
                 else _auto_b_blk(L, S.shape[0], 12 * L * L, budget=14.5e6))
    elif streamed:
        b_blk = min(b_blk, _streamed_b_blk(L))
    B0 = S.shape[0]
    B = -(-B0 // b_blk) * b_blk
    S = _pad_batch(jnp.asarray(S, jnp.int32), B)
    n = jnp.maximum(_pad_batch(jnp.asarray(n, jnp.int32), B), 1)
    if allow is not None:
        allow = _pad_batch(jnp.asarray(allow, bool), B)
    kt = F32(bt.kt)
    nf = jnp.maximum(n.astype(F32), 1.0)

    es = jnp.full((B,), es0, F32)
    ins, aux, sig = batch_inside(bt, S, n, es, b_blk, interpret, allow)

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
        ins2, aux2, _ = batch_inside(bt, S, n, es2, b_blk, interpret, allow)
        return (es2, ins2, aux2, it + 1)

    es, ins, aux, _ = jax.lax.while_loop(cond, body,
                                         (es, ins, aux, jnp.int32(0)))
    sig = jnp.exp(-es / kt)
    L = S.shape[1]
    q1pad = jnp.concatenate([jnp.ones((B, 1), F32), ins.q1[:, :-1]], axis=1)
    fcbl = tuple(getattr(aux["ffc"], f) for f in FACTOR_FIELDS)
    ob_c = outside_pallas_streamed(
        fcbl, aux["qmT"], aux["qm1_c"], q1pad, ins.q2, aux["w2k"],
        aux["bulge_k"], sig[:, None], aux["pows"], L, B, b_blk,
        interpret, unroll=not streamed)
    ob = _from_cbl(ob_c)
    zn = ins.zn
    bpp = jnp.where(zn[:, None, None] > 0, ins.qb * ob / zn[:, None, None],
                    0.0)
    sl = lambda t: t[:B0]
    return dict(
        ins=jax.tree_util.tree_map(sl, ins),
        ff=jax.tree_util.tree_map(sl, aux["ffn"]),
        ob=sl(ob), bpp=sl(bpp), sig=sl(sig), es=sl(es))
