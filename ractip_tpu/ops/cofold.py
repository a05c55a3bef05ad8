"""Co-folding partition function: joint McCaskill over two concatenated strands.

Implements the probability source of the reference's default hybridization
path (reference src/ractip.cpp:384-459: Vienna co_pf_fold over s1+s2 with
cut_point = |s1|+1, cross-cut posteriors kept above th_hy): the ensemble of
all joint secondary structures of the concatenation where any loop whose
backbone traverses the strand cut is scored as an *exterior* loop (no
hairpin/interior/multiloop penalty; stems get exterior dangles).  That
cut-scoring rule is exactly ops.eos.structure_energy's `cut` semantics, which
the enumeration oracle uses -- so this DP is validated against full joint-
structure enumeration.

Structure of the DP (extends ops.mccaskill's column-scan design):
  * same-strand recurrences are the standard McCaskill cases, guarded so no
    loop stretch or multiloop junction silently crosses the cut;
  * a cut-spanning pair (i < c <= j) adds the "exposed-cut" case
        qb[i,j] += fcx[i,j] * q[i+1, c-1] * q[c, j-1]
    where q[a,b] is the exterior-segment partition function (a new running
    [L, L] table, one matvec per column) and fcx the exterior closing factor;
  * spanning pairs with the cut hidden inside a nested spanning child use the
    ordinary guarded interior/multiloop cases.

The outside pass mirrors every case; branches inside exposed segments receive
their outer weight through two rank-structured sweeps (G_A / H_B) built from
the same q table.  Posterior cross-cut pair probabilities form the
hybridization matrix hp[i1, i2] = p(i1, c + i2).

All tables are scaled linear space (sigma per base), float32-friendly,
batched via vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAXLOOP, PAIR_TYPE, RTYPE, TURN
from ..params.boltz import BoltzTables, get_boltz
from ..params.tables import EnergyParams
from .mccaskill import (HUGE, SCALE_E0, W, ZHI, ZLO, _pad_cols, _sg,
                        _shift_down, _shift_up, _sig_kernels)



def _ds(M, starts, sizes):
    """dynamic_slice with int32-coerced starts (mixed-x64-safe)."""
    return jax.lax.dynamic_slice(
        M, tuple(jnp.asarray(s, jnp.int32) for s in starts), sizes)


def _dus(M, U, starts):
    """dynamic_update_slice with int32-coerced starts (mixed-x64-safe)."""
    return jax.lax.dynamic_update_slice(
        M, U, tuple(jnp.asarray(s, jnp.int32) for s in starts))

class CoFactors(NamedTuple):
    """[L, L] Boltzmann-factor matrices with cut-aware masks folded in."""

    fhn: jnp.ndarray     # hairpin (same-strand only)
    pstk: jnp.ndarray    # stack (both adjacencies same-strand)
    p11: jnp.ndarray
    p21a: jnp.ndarray
    p21b: jnp.ndarray
    p22: jnp.ndarray
    pb15: jnp.ndarray
    pb13: jnp.ndarray
    tau: jnp.ndarray
    taur: jnp.ndarray
    mout: jnp.ndarray
    minn: jnp.ndarray
    fmb: jnp.ndarray
    fmc: jnp.ndarray
    fe: jnp.ndarray      # exterior stem factor, cut-aware dangles
    fcx: jnp.ndarray     # exposed-cut closing factor for spanning pairs


def co_factors(bt: BoltzTables, S: jnp.ndarray, n: jnp.ndarray,
               cut: jnp.ndarray, dtype=jnp.float32, sigma=None,
               allow=None, span_loop_penalty=None) -> CoFactors:
    """Cut-aware factor matrices.  `cut` = index of the first base of strand 2.

    Mask conventions: a loop stretch i..k (inclusive of the junctions at both
    ends) must not cross the cut unless hidden inside a nested pair, i.e.
    forbidden iff i < cut <= k.

    `allow` (optional bool [L, L], concatenated coordinates) restricts the
    joint ensemble to structures whose pairs all satisfy allow[i, j]
    (reference: constrained co_pf_fold, src/ractip.cpp:403-444).

    `span_loop_penalty` (kcal/mol, EXPERIMENTAL -- DIS audit, RESULTS.md):
    adds this free energy to every two-sided loop (stack/bulge/interior)
    whose CLOSING pair spans the cut, probing alternative scoring
    conventions for the cut-spanning helix; np.inf scores every such loop
    as disallowed (the "spanning helices get no stacking" straw variant).
    None/0.0 = the validated convention (identical to ops.eos cut
    semantics).
    """
    L = S.shape[0]
    pair_tbl = jnp.asarray(np.array(PAIR_TYPE, np.int32))
    rtype_tbl = jnp.asarray(np.array(RTYPE, np.int32))
    f = lambda a: jnp.asarray(a, dtype)
    c = cut

    I = jnp.arange(L)[:, None]
    J = jnp.arange(L)[None, :]
    span = J - I - 1

    t = pair_tbl[S[:, None], S[None, :]]
    rt = rtype_tbl[t]
    tv = t > 0
    if allow is not None:
        tv = tv & jnp.asarray(allow, bool)
    sig = jnp.asarray(bt.sigma if sigma is None else sigma, dtype)
    same = ~((I < c) & (c <= J))          # no cut strictly inside (i, j]
    spanning = (I < c) & (c <= J) & tv

    def srow(off):
        return _sg(S, off)[:, None]

    def scol(off):
        return _sg(S, off)[None, :]

    si1, sj1 = srow(1), scol(-1)
    si2, sj2 = srow(2), scol(-2)
    sim1, sjp1 = srow(-1), scol(1)

    def tr_at(di, dj):
        a = jnp.broadcast_to(_sg(S, dj)[None, :], (L, L))
        b = jnp.broadcast_to(_sg(S, di)[:, None], (L, L))
        return pair_tbl[a, b]

    tr = tr_at(0, 0)

    sizes = np.arange(max(L + 1, 32), dtype=np.float64)
    hp_ext = np.zeros(max(L + 1, 32))
    hp_ext[:31] = bt.hairpin
    hp_ext[31:] = bt.hairpin[30] * (sizes[31:] / 30.0) ** (-10.0 * bt.lxc / bt.kt)
    hp_ext = jnp.asarray(hp_ext[: L + 1])

    span_c = jnp.clip(span, 0, L)
    mism = jnp.where(span == 3, f(bt.term_au)[t], f(bt.mismatch_h)[t, si1, sj1])
    key6 = jnp.zeros(L, jnp.int32)
    for k in range(6):
        key6 = key6 * 5 + _sg(S, k)
    tetra = jnp.where(span == 4, f(bt.tetra)[key6][:, None], f(1.0))
    valid_hp = tv & (span >= TURN) & same
    fhn = jnp.where(valid_hp, f(hp_ext)[span_c] * mism * tetra, 0.0)
    fhn = fhn * sig ** (span_c + 2).astype(dtype)

    def m5(d):
        """Allow a 5' jump i -> i+d (stretch + junctions must not cross)."""
        return ~((I < c) & (c <= I + d))

    def m3(d):
        """Allow a 3' jump j-d -> j."""
        return ~((J - d < c) & (c <= J))

    pstk = jnp.where(tv & m5(1) & m3(1), f(bt.stack)[t, tr_at(1, -1)] * sig ** 2, 0.0)
    p11 = jnp.where(tv & m5(2) & m3(2), f(bt.int11)[t, tr_at(2, -2), si1, sj1] * sig ** 4, 0.0)
    p21a = jnp.where(tv & m5(2) & m3(3), f(bt.int21)[t, tr_at(2, -3), si1, sj2, sj1] * sig ** 5, 0.0)
    p21b = jnp.where(tv & m5(3) & m3(2), f(bt.int21)[tr_at(3, -2), t, sj1, si1, si2] * sig ** 5, 0.0)
    p22 = jnp.where(tv & m5(3) & m3(3), f(bt.int22)[t, tr_at(3, -3), si1, si2, sj2, sj1] * sig ** 6, 0.0)
    pb15 = jnp.where(tv & m5(2) & m3(1), f(bt.stack)[t, tr_at(2, -1)] * f(bt.bulge[1]) * sig ** 3, 0.0)
    pb13 = jnp.where(tv & m5(1) & m3(2), f(bt.stack)[t, tr_at(1, -2)] * f(bt.bulge[1]) * sig ** 3, 0.0)

    if span_loop_penalty is not None:
        # kt is in cal/mol (params.boltz); penalty is kcal/mol
        pen = jnp.asarray(np.exp(-span_loop_penalty * 1000.0 / bt.kt), dtype)
        span_cl = ((I < c) & (c <= J)).astype(dtype)
        sc = span_cl * pen + (1.0 - span_cl)
        pstk, p11, p21a, p21b = pstk * sc, p11 * sc, p21a * sc, p21b * sc
        p22, pb15, pb13 = p22 * sc, pb15 * sc, pb13 * sc

    tau = jnp.where(tv, f(bt.term_au)[t], 0.0)
    taur = jnp.where(tr > 0, f(bt.term_au)[tr], 0.0)
    mout = jnp.where(tv, f(bt.mismatch_i)[t, si1, sj1], 0.0)
    if span_loop_penalty is not None:
        tau, mout = tau * sc, mout * sc
    minn = jnp.where(tr > 0, f(bt.mismatch_i)[tr, sjp1, sim1], 0.0)

    d5 = f(bt.dangle5)
    d3 = f(bt.dangle3)
    fmb = jnp.where(tv, f(bt.ml_intern) * f(bt.term_au)[t]
                    * d5[t, sim1] * d3[t, sjp1], 0.0)
    fmc = jnp.where(tv, f(bt.ml_closing * bt.ml_intern) * f(bt.term_au)[rt]
                    * d3[rt, si1] * d5[rt, sj1], 0.0)
    # exterior stem: dangles only within-strand (reference eos._dangle_ok)
    fe = jnp.where(tv, f(bt.term_au)[t]
                   * jnp.where((I > 0) & (I != c), d5[t, sim1], 1.0)
                   * jnp.where((J < n - 1) & (J + 1 != c), d3[t, sjp1], 1.0), 0.0)
    # exposed-cut closing stem (reversed orientation; inner dangles in-strand)
    fcx = jnp.where(spanning, f(bt.term_au)[rt]
                    * jnp.where(I + 1 < c, d3[rt, si1], 1.0)
                    * jnp.where(J - 1 >= c, d5[rt, sj1], 1.0)
                    * sig ** 2, 0.0)

    return CoFactors(
        fhn=fhn.astype(dtype), pstk=pstk.astype(dtype), p11=p11.astype(dtype),
        p21a=p21a.astype(dtype), p21b=p21b.astype(dtype), p22=p22.astype(dtype),
        pb15=pb15.astype(dtype), pb13=pb13.astype(dtype), tau=tau.astype(dtype),
        taur=taur.astype(dtype), mout=mout.astype(dtype), minn=minn.astype(dtype),
        fmb=fmb.astype(dtype), fmc=fmc.astype(dtype), fe=fe.astype(dtype),
        fcx=fcx.astype(dtype))


class CoInsideState(NamedTuple):
    qb: jnp.ndarray
    qm: jnp.ndarray
    qm1: jnp.ndarray
    qx: jnp.ndarray    # [L, L] exterior-segment pf q[a, b] (within-strand use)
    q1: jnp.ndarray    # exterior prefix over the whole concatenation
    q2: jnp.ndarray    # exterior suffix
    zn: jnp.ndarray
    sat: jnp.ndarray   # scalar bool: some DP column hit the HUGE ceiling


def _cut_masks(bt: BoltzTables, L: int, cut, dtype, sigma=None):
    """Precomputed dynamic-cut masks for the column scans (traced-sigma safe)."""
    I = jnp.arange(L)
    # M5[d, i] = allow 5' jump i -> i+d (d = 0..W)
    D = jnp.arange(W + 1)[:, None]
    M5 = (~((I[None, :] < cut) & (cut <= I[None, :] + D))).astype(dtype)
    # decay matrix with unpaired ML run i..k-1 + junction at k not crossing:
    # forbidden iff i < cut <= k
    ik = I
    d = np.arange(L)[None, :] - np.arange(L)[:, None]
    if sigma is None:
        Dm = jnp.asarray(
            np.where(d >= 0, (bt.sigma * bt.ml_base) ** np.maximum(d, 0), 0.0),
            dtype)
    else:
        smlb = jnp.asarray(sigma, dtype) * jnp.asarray(bt.ml_base, dtype)
        Dm = jnp.where(jnp.asarray(d >= 0),
                       smlb ** jnp.asarray(np.maximum(d, 0), dtype), 0.0)
    Dmask = (~((ik[:, None] < cut) & (cut <= ik[None, :]))).astype(dtype)
    D_cut = Dm * Dmask
    # J1[m] = allow a segment/branch junction (m-1 | m): forbidden iff m == cut
    J1 = (I != cut).astype(dtype)
    return M5, D_cut, J1


def co_inside(ff: CoFactors, bt: BoltzTables, n: jnp.ndarray,
              cut: jnp.ndarray, dtype=jnp.float32, sigma=None) -> CoInsideState:
    L = ff.fhn.shape[0]
    sig, smlb, w2k, bulge_k = _sig_kernels(bt, sigma, dtype)
    M5, D_cut, J1 = _cut_masks(bt, L, cut, dtype, sigma)
    c = cut

    minn_pad = _pad_cols(ff.minn, left=W)
    taur_pad = _pad_cols(ff.taur, left=W)
    eyeL = jnp.eye(L, dtype=dtype)

    def body(j, st):
        j = jnp.asarray(j, jnp.int32)
        qb, qm, qm1, qx, q1, Qbuf, qxA, sat = st
        # Qbuf[:, b] = qb column (j - W + b)

        def col(M):
            return _ds(M, (0, j), (L, 1))[:, 0]

        # 3' source mask for buffer column b (source col s = j - W + b):
        # stretch (s .. j] must not cross the cut
        src = j - W + jnp.arange(W)
        bmask = (~((src < c) & (c <= j))).astype(dtype)[None, :]

        minn_p = _ds(minn_pad, (0, j), (L, W))
        taur_p = _ds(taur_pad, (0, j), (L, W))
        Xp = Qbuf * minn_p * bmask
        Ap = Qbuf * taur_p * bmask

        gen = jnp.zeros((L,), dtype)
        for u1 in range(1, MAXLOOP):
            gen = gen + M5[u1 + 1] * (_shift_up(Xp, u1 + 1) @ w2k[u1, ::-1])
        gen = gen * col(ff.mout)

        acol = Ap[:, W - 1]
        b5 = jnp.zeros((L,), dtype)
        for m in range(2, MAXLOOP + 1):
            b5 = b5 + bulge_k[m] * M5[m + 1] * _shift_up(acol, m + 1)
        b3 = Ap[:, : W - 2] @ bulge_k[2:][::-1]
        bulges = col(ff.tau) * (b5 + M5[1] * _shift_up(b3, 1))

        qm1_prev = jnp.where(
            j >= 1, _ds(qm1, (0, jnp.maximum(j - 1, 0)), (L, 1))[:, 0], 0.0)
        # segment | branch junction must not sit on the cut
        qm2col = qm @ (_shift_up(qm1_prev, 1) * _shift_up(J1, 1))

        # exposed-cut case for spanning pairs: fcx * q(i+1, c-1) * q(c, j-1)
        qxB = jnp.where(j > c, _ds(qx, (jnp.minimum(c, L - 1), jnp.maximum(j - 1, 0)), (1, 1))[0, 0], 1.0)
        spancol = col(ff.fcx) * _shift_up(qxA, 1) * qxB

        qbcol = (col(ff.fhn)
                 + gen + bulges
                 + col(ff.pstk) * _shift_up(Qbuf[:, W - 1], 1)
                 + col(ff.p11) * _shift_up(Qbuf[:, W - 2], 2)
                 + col(ff.p21a) * _shift_up(Qbuf[:, W - 3], 2)
                 + col(ff.p21b) * _shift_up(Qbuf[:, W - 2], 3)
                 + col(ff.p22) * _shift_up(Qbuf[:, W - 3], 3)
                 + col(ff.pb15) * _shift_up(Qbuf[:, W - 1], 2)
                 + col(ff.pb13) * _shift_up(Qbuf[:, W - 2], 1)
                 + jnp.where(j != c, 1.0, 0.0) * col(ff.fmc) * sig ** 2
                 * (M5[1] * _shift_up(qm2col, 1))
                 + spancol)

        qm1col = jnp.where(j != c, smlb, 0.0) * qm1_prev + qbcol * col(ff.fmb)
        qmcol = D_cut @ qm1col + qm @ (_shift_up(qm1col, 1) * _shift_up(J1, 1))

        q1_prev = jnp.where(j >= 1, q1[jnp.maximum(j - 1, 0)], 1.0)
        q1pad = _shift_down(q1, 1).at[0].set(1.0)
        qbecol = qbcol * col(ff.fe)
        q1val = sig * q1_prev + jnp.sum(q1pad * qbecol)

        # exterior-segment table column: q[a, j]
        qx_prev = jnp.where(
            j >= 1, _ds(qx, (0, jnp.maximum(j - 1, 0)), (L, 1))[:, 0], 0.0)
        onej = (jnp.arange(L) == j).astype(dtype)
        # sum_k q[a, k-1] * qbe[k, j]: shift qx columns right by one
        qx_sh = jnp.concatenate([jnp.zeros((L, 1), dtype), qx[:, : L - 1]], axis=1)
        qxcol = sig * (qx_prev + onej) + qx_sh @ qbecol + qbecol

        # saturating arithmetic + flag (drives the adaptive-sigma retry)
        mx = jnp.maximum(jnp.maximum(jnp.max(qbcol), jnp.max(qmcol)),
                         jnp.maximum(jnp.max(qxcol), q1val))
        sat = sat | ~(mx < HUGE)
        hf = jnp.asarray(HUGE, dtype)
        qbcol, qm1col = jnp.minimum(qbcol, hf), jnp.minimum(qm1col, hf)
        qmcol, qxcol = jnp.minimum(qmcol, hf), jnp.minimum(qxcol, hf)
        q1val = jnp.minimum(q1val, hf)

        qb = _dus(qb, qbcol[:, None], (0, j))
        qm1 = _dus(qm1, qm1col[:, None], (0, j))
        qm = _dus(qm, qmcol[:, None], (0, j))
        qx = _dus(qx, qxcol[:, None], (0, j))
        q1 = q1.at[j].set(q1val)
        Qbuf = jnp.concatenate([Qbuf[:, 1:], qbcol[:, None]], axis=1)
        return (qb, qm, qm1, qx, q1, Qbuf, qxA, sat)

    z = jnp.zeros((L, L), dtype)
    st = (z, z, z, z, jnp.zeros((L,), dtype), jnp.zeros((L, W), dtype),
          jnp.zeros((L,), dtype), jnp.zeros((), bool))
    st = jax.lax.fori_loop(0, c, body, st)
    # qxA[p] = q[p, c-1] (exterior pf of p..c-1 within strand A); empty -> 1
    qb, qm, qm1, qx, q1, Qbuf, _, sat = st
    Iv = jnp.arange(L)
    qxA = _ds(qx, (0, jnp.maximum(c - 1, 0)), (L, 1))[:, 0]
    qxA = jnp.where(Iv < c, qxA, jnp.where(Iv == c, 1.0, 0.0))
    st = (qb, qm, qm1, qx, q1, Qbuf, qxA, sat)
    st = jax.lax.fori_loop(c, L, body, st)
    qb, qm, qm1, qx, q1, _, qxA, sat = st

    zn = q1[n - 1]

    qbe = qb * ff.fe

    def body2(k, q2):
        i = L - 1 - k
        s = jnp.sum(qbe[i, :] * q2[1:])
        val = jnp.where(i >= n, 1.0, sig * q2[i + 1] + s)
        return q2.at[i].set(jnp.minimum(val, jnp.asarray(HUGE, dtype)))

    q2 = jax.lax.fori_loop(0, L, body2, jnp.ones((L + 1,), dtype))

    return CoInsideState(qb=qb, qm=qm, qm1=qm1, qx=qx, q1=q1, q2=q2, zn=zn,
                         sat=sat)


class CoOutsideState(NamedTuple):
    ob: jnp.ndarray
    bpp: jnp.ndarray


def co_outside(ff: CoFactors, bt: BoltzTables, ins: CoInsideState,
               n: jnp.ndarray, cut: jnp.ndarray,
               dtype=jnp.float32, sigma=None) -> CoOutsideState:
    """Transpose of co_inside.  Reverse column scan split at the cut so the
    exposed-segment adjoints (G_A for strand-A branches, H_B for strand-B
    branches) can be assembled from the completed spanning-pair outer weights."""
    L = ff.fhn.shape[0]
    sig, smlb, w2k, bulge_k = _sig_kernels(bt, sigma, dtype)
    M5, D_cut, J1 = _cut_masks(bt, L, cut, dtype, sigma)
    c = cut

    qb, qm, qm1, qx = ins.qb, ins.qm, ins.qm1, ins.qx
    q1pad = _shift_down(ins.q1, 1).at[0].set(1.0)
    I = jnp.arange(L)

    # qxA[p] = q(p, c-1) within A (empty -> 1); qBpref[k] = q(c, k-1) within B
    qxA = _ds(qx, (0, jnp.maximum(c - 1, 0)), (L, 1))[:, 0]
    qxA = jnp.where(I < c, qxA, jnp.where(I == c, 1.0, 0.0))
    qrow_c = _ds(qx, (jnp.minimum(c, L - 1), 0), (1, L))[0, :]
    qBpref = _shift_down(qrow_c, 1)               # q(c, k-1)
    qBpref = jnp.where(I == c, 1.0, qBpref)       # empty prefix
    qBpref = jnp.where(I >= c, qBpref, 0.0)

    specials = [(_pad_cols(P, right=W), di, dj) for P, di, dj in (
        (ff.pstk, 1, 1), (ff.p11, 2, 2), (ff.p21a, 2, 3),
        (ff.p21b, 3, 2), (ff.p22, 3, 3), (ff.pb15, 2, 1), (ff.pb13, 1, 2))]

    def body(k_iter, st):
        ob, om, om1, sm1, Obuf, OMbuf, OAbuf, vvec = st
        cc = jnp.asarray(L - 1 - k_iter, jnp.int32)

        def col(M):
            return _ds(M, (0, cc), (L, 1))[:, 0]

        omcol = col(om)
        om1col = (col(om1) + D_cut.T @ omcol
                  + J1 * _shift_down(qm.T @ omcol, 1))
        sm1 = om1col + jnp.where(cc + 1 != c, smlb, 0.0) * sm1

        obcol = q1pad * col(ff.fe) * ins.q2[cc + 1]
        obcol = obcol + col(ff.fmb) * sm1

        # 3' mask mirrored: outer column s = cc + 1 + d reads inner at cc
        src = cc + 1 + jnp.arange(W)                  # outer j for offset d
        bmask = (~((cc < c) & (c <= src))).astype(dtype)[None, :]
        OMm = OMbuf * bmask
        OAm = OAbuf * bmask

        gen = jnp.zeros((L,), dtype)
        for u1 in range(1, MAXLOOP):
            gen = gen + _shift_down(OMm * M5[u1 + 1][:, None], u1 + 1) @ w2k[u1, :]
        obcol = obcol + gen * col(ff.minn)

        oa1 = OAm[:, 0]
        b5 = jnp.zeros((L,), dtype)
        for m in range(2, MAXLOOP + 1):
            b5 = b5 + bulge_k[m] * _shift_down(oa1 * M5[m + 1], m + 1)
        b3 = (OAm * M5[1][:, None])[:, 2:W] @ bulge_k[2:]
        obcol = obcol + col(ff.taur) * (b5 + _shift_down(b3, 1))

        for Ppad, di, dj in specials:
            pc = _ds(Ppad, (0, cc + dj), (L, 1))[:, 0]
            obcol = obcol + _shift_down(pc * Obuf[:, dj - 1], di)

        # exposed-segment adjoints
        # strand-B branch (k, cc), cc >= c: fe * q(c, k-1) * H_B(cc)
        # H_B(cc) = sum_{j > cc} v[j] * q(cc+1, j-1) (empty segment j=cc+1 -> 1)
        qrow = _ds(
            qx, (jnp.minimum(cc + 1, L - 1), 0), (1, L))[0, :]
        hb = jnp.sum(_shift_up(vvec, 1) * qrow)
        hb = hb + vvec[jnp.minimum(cc + 1, L - 1)] * jnp.where(cc + 1 < L, 1.0, 0.0)
        obcol = obcol + jnp.where(cc >= c, hb, 0.0) * col(ff.fe) * qBpref

        # strand-A branch (k, cc), cc < c: fe * G_A(k) * q(cc+1, c-1)
        qseg = jnp.where(cc + 1 == c, 1.0,
                         _ds(qx, (jnp.minimum(cc + 1, L - 1), jnp.maximum(c - 1, 0)), (1, 1))[0, 0])
        obcol = obcol + jnp.where(cc < c, qseg, 0.0) * col(ff.fe) * GA

        # --- scatters feeding later (smaller-cc) steps ---
        mlgate = jnp.where(cc != c, 1.0, 0.0)
        a = obcol * col(ff.fmc) * sig ** 2 * mlgate
        a = M5[1] * a
        qm1_cm1 = jnp.where(
            cc >= 1, _ds(qm1, (0, jnp.maximum(cc - 1, 0)), (L, 1))[:, 0], 0.0)
        om = om + jnp.outer(_shift_down(a, 1),
                            _shift_up(qm1_cm1, 1) * _shift_up(J1, 1))
        pend = J1 * _shift_down(qm.T @ _shift_down(a, 1), 1)
        prev = jnp.where(
            cc >= 1, _ds(om1, (0, jnp.maximum(cc - 1, 0)), (L, 1))[:, 0], 0.0)
        om1 = _dus(om1, (prev + pend)[:, None],
                                           (0, jnp.maximum(cc - 1, 0)))
        om = om + jnp.outer(omcol, _shift_up(col(qm1), 1) * _shift_up(J1, 1))

        # spanning-pair exposed-case adjoint accumulator:
        # v(j) = sum_i ob[i,j] * fcx[i,j] * q(i+1, c-1)
        vvec = vvec.at[cc].set(jnp.where(
            cc >= c, jnp.sum(obcol * col(ff.fcx) * _shift_up(qxA, 1)), 0.0))

        obcol = jnp.minimum(obcol, jnp.asarray(HUGE, dtype))
        ob = _dus(ob, obcol[:, None], (0, cc))
        om1 = _dus(om1, om1col[:, None], (0, cc))
        Obuf = jnp.concatenate([obcol[:, None], Obuf[:, :-1]], axis=1)
        OMbuf = jnp.concatenate([(obcol * col(ff.mout))[:, None], OMbuf[:, :-1]], axis=1)
        OAbuf = jnp.concatenate([(obcol * col(ff.tau))[:, None], OAbuf[:, :-1]], axis=1)
        return (ob, om, om1, sm1, Obuf, OMbuf, OAbuf, vvec)

    z = jnp.zeros((L, L), dtype)
    GA = jnp.zeros((L,), dtype)
    st = (z, z, z, jnp.zeros((L,), dtype),
          jnp.zeros((L, W), dtype), jnp.zeros((L, W), dtype),
          jnp.zeros((L, W), dtype), jnp.zeros((L,), dtype))
    # phase 1: columns L-1 down to c (spanning + strand-B columns)
    st = jax.lax.fori_loop(0, L - c, body, st)
    ob, om, om1, sm1, Obuf, OMbuf, OAbuf, vvec = st

    # w(i) = sum_{j >= c} ob[i,j] * fcx[i,j] * q(c, j-1): spanning-pair weight
    qxB_row = _shift_down(_ds(
        qx, (jnp.minimum(c, L - 1), 0), (1, L))[0, :], 1)      # q(c, j-1)
    qxB_row = jnp.where(I == c, 1.0, qxB_row)
    qxB_row = jnp.where(I >= c, qxB_row, 0.0)
    wvec = jnp.sum(ob * ff.fcx * qxB_row[None, :], axis=1)
    # G_A(k) = sum_{i < k} w(i) * q(i+1, k-1): one matvec with shifted qx
    qx_shift = jnp.concatenate([qx[1:, :], jnp.zeros((1, L), dtype)], axis=0)
    qx_sh2 = jnp.concatenate([jnp.zeros((L, 1), dtype), qx_shift[:, : L - 1]], axis=1)
    GA = qx_sh2.T @ wvec + _shift_down(wvec, 1)    # empty segment (k = i+1)

    # phase 2: columns c-1 down to 0 (strand-A columns) -- GA is now closed over
    def body2(k_iter, st):
        return body(k_iter, st)

    st = (ob, om, om1, sm1, Obuf, OMbuf, OAbuf, vvec)
    st = jax.lax.fori_loop(L - c, L, body2, st)
    ob = st[0]

    zn = ins.zn
    bpp = jnp.where(zn > 0, ins.qb * ob / zn, 0.0)
    return CoOutsideState(ob=ob, bpp=bpp)


def cofold(params: EnergyParams, S1: jnp.ndarray, S2: jnp.ndarray,
           n1: jnp.ndarray, n2: jnp.ndarray, dtype=jnp.float32, scale_e=None,
           allow=None, span_loop_penalty=None):
    """Joint fold of the concatenation.  Returns (CoInsideState, CoOutsideState).

    S1/S2 are padded encodings; the concatenation packs S1[:n1] then S2[:n2]
    into one padded buffer of length len(S1)+len(S2).
    """
    L1, L2 = S1.shape[0], S2.shape[0]
    L = L1 + L2
    idx = jnp.arange(L)
    S2_rolled = jnp.roll(jnp.concatenate([S2, jnp.zeros((L1,), S2.dtype)]), n1)
    S = jnp.where(idx < n1, jnp.concatenate([S1, jnp.zeros((L2,), S1.dtype)]),
                  S2_rolled)
    n = n1 + n2
    bt = get_boltz(params)
    kt = jnp.asarray(bt.kt, dtype)
    nf = jnp.maximum(jnp.asarray(n).astype(dtype), 1.0)

    def probe(es):
        sig = jnp.exp(-es / kt)
        ff = co_factors(bt, S, n, n1, dtype, sig, allow, span_loop_penalty)
        return co_inside(ff, bt, n, n1, dtype, sig)

    if scale_e is None:
        # adaptive pf scaling (see ops.mccaskill.adaptive_inside)
        def good(st):
            return (~st.sat) & (st.zn > ZLO) & (st.zn < ZHI) \
                & jnp.isfinite(st.zn)

        def cond(c):
            es, st, it = c
            return (it < 8) & ~good(st)

        def loop_body(c):
            es, st, it = c
            step = kt * 60.0 / nf
            bad_hi = st.sat | ~jnp.isfinite(st.zn) | (st.zn >= ZHI)
            es2 = jnp.where(bad_hi, es + step,
                            jnp.where(st.zn > 0,
                                      es + kt * jnp.log(st.zn) / nf,
                                      es - step))
            return (es2, probe(es2), it + 1)

        es = jnp.asarray(SCALE_E0, dtype)
        ins = probe(es)
        es, ins, _ = jax.lax.while_loop(cond, loop_body, (es, ins, jnp.int32(0)))
    else:
        es = jnp.asarray(scale_e, dtype)
        ins = probe(es)
    sig = jnp.exp(-es / kt)
    ff = co_factors(bt, S, n, n1, dtype, sig, allow, span_loop_penalty)
    out = co_outside(ff, bt, ins, n, n1, dtype, sig)
    return ins, out


def cofold_hybrid_probs(params: EnergyParams, S1: jnp.ndarray, S2: jnp.ndarray,
                        n1: jnp.ndarray, n2: jnp.ndarray, dtype=jnp.float32,
                        allow=None, span_loop_penalty=None):
    """hp[i1, i2] = P(S1[i1] pairs S2[i2]) under the joint (cofold) ensemble --
    the reference's default hybridization posteriors (src/ractip.cpp:442-453)."""
    L1, L2 = S1.shape[0], S2.shape[0]
    ins, out = cofold(params, S1, S2, n1, n2, dtype, allow=allow,
                      span_loop_penalty=span_loop_penalty)
    # extract the cross block [i, n1 + j]
    cols = n1 + jnp.arange(L2)[None, :]                  # [1, L2]
    rows = jnp.arange(L1)[:, None]
    hp = out.bpp[rows, jnp.clip(cols, 0, L1 + L2 - 1)]
    hp = jnp.where((rows < n1) & (jnp.arange(L2)[None, :] < n2), hp, 0.0)
    return hp
