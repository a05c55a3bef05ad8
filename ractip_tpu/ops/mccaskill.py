"""Single-sequence McCaskill partition function: inside/outside + pair probabilities.

TPU-first design
----------------
The O(n^3) inside recurrence runs as a column scan (jax.lax.fori_loop over the
3' index j).  All sequence/pair-dependent energies are precomputed as [L, L]
Boltzmann-factor matrices, so the per-column work is pure vector/matrix algebra:

  * banded interior loops (<= MAXLOOP unpaired) read a rolling 31-column window
    of the paired matrix; the generic-loop size/asymmetry kernel is a fixed
    [31, 31] stencil (bt.w2) applied with shifted multiply-accumulates;
  * the multiloop "at least two branches" term is a matvec against the running
    qm matrix (the MXU-eligible contraction);
  * special small loops (stacks, 1-bulges, 1x1/1x2/2x1/2x2) are single shifted
    columns with exact table factors.

The outside pass is the hand-written transpose of the inside pass (same cost
structure, plus two rank-1 updates per column), yielding base-pair
probabilities and the outer-weight matrix `ob` needed by the accessibility
module.  Everything is in scaled linear space (per-base factor sigma keeps
float32 in range), batched via vmap.

Semantics match the reference's probability source #1: Vienna pf_fold with BL*
parameters (reference src/ractip.cpp:248-306, :546-547), under the Vienna-1.8
"dangles=2" end-contribution rules spelled out in reference src/pf_duplex.c.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAXLOOP, PAIR_TYPE, RTYPE, TURN
from ..params.boltz import BoltzTables, get_boltz
from ..params.tables import EnergyParams

W = MAXLOOP + 1  # interior-loop window width (31)

# Saturating-arithmetic ceiling and the acceptance window for the scaled
# partition function.  The per-base scale sigma = exp(-scale_e / kT) is chosen
# adaptively per instance (the TPU-native equivalent of Vienna's pf_scale,
# reference src/ractip.cpp:344-356 sets pf_scale before pf_fold) so that the
# scaled total zn lands inside [ZLO, ZHI]; DP columns saturate at HUGE instead
# of overflowing to inf, and the saturation flag triggers a rescale retry.
HUGE = 1e30
ZLO = 1e-12
ZHI = 1e12
SCALE_E0 = 185.0  # initial per-base scale energy (cal/mol), tuned for typical RNA


def _shift_up(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = v[i+k] (zero fill).  Static k; shifts axis 0."""
    if k == 0:
        return v
    L = v.shape[0]
    k = min(k, L)
    pad = jnp.zeros((k,) + v.shape[1:], v.dtype)
    return jnp.concatenate([v[k:], pad], axis=0)


def _shift_down(v: jnp.ndarray, k: int) -> jnp.ndarray:
    if k == 0:
        return v
    L = v.shape[0]
    k = min(k, L)
    pad = jnp.zeros((k,) + v.shape[1:], v.dtype)
    return jnp.concatenate([pad, v[: L - k]], axis=0)


class FoldFactors(NamedTuple):
    """Per-sequence [L, L] Boltzmann-factor matrices (see module docstring)."""

    fhn: jnp.ndarray     # hairpin (sigma^(span+2) folded in)
    pstk: jnp.ndarray    # stack: outer (i,j) on inner (i+1,j-1)
    p11: jnp.ndarray     # 1x1 interior (inner (i+2, j-2))
    p21a: jnp.ndarray    # 1x2 interior (inner (i+2, j-3))
    p21b: jnp.ndarray    # 2x1 interior (inner (i+3, j-2))
    p22: jnp.ndarray     # 2x2 interior (inner (i+3, j-3))
    pb15: jnp.ndarray    # 1-bulge 5' (inner (i+2, j-1))
    pb13: jnp.ndarray    # 1-bulge 3' (inner (i+1, j-2))
    tau: jnp.ndarray     # TerminalAU factor of the pair at (i,j)
    taur: jnp.ndarray    # TerminalAU factor of the reversed pair at (i,j)
    mout: jnp.ndarray    # generic-interior mismatch, outer side
    minn: jnp.ndarray    # generic-interior mismatch, inner side
    fmb: jnp.ndarray     # multiloop branch stem factor
    fmc: jnp.ndarray     # multiloop closing factor
    fe: jnp.ndarray      # exterior stem factor


class InsideState(NamedTuple):
    qb: jnp.ndarray    # [L, L] paired partition fn (scaled)
    qm: jnp.ndarray    # [L, L] multiloop segment, >=1 branch
    qm1: jnp.ndarray   # [L, L] multiloop segment, 1 branch starting at the 5' end
    qm2: jnp.ndarray   # [L, L] multiloop segment, >=2 branches
    q1: jnp.ndarray    # [L] exterior prefix partition fn q1[j] ~ Z(0..j)
    q2: jnp.ndarray    # [L+1] exterior suffix partition fn q2[i] ~ Z(i..n-1)
    zn: jnp.ndarray    # scalar: scaled total partition function
    sat: jnp.ndarray   # scalar bool: some DP column hit the HUGE ceiling


class OutsideState(NamedTuple):
    ob: jnp.ndarray    # [L, L] outer weights: p = qb * ob / zn
    bpp: jnp.ndarray   # [L, L] pair probabilities (i < j)


def _sg(S: jnp.ndarray, off: int) -> jnp.ndarray:
    """S[i + off] with 0 outside the array."""
    L = S.shape[0]
    idx = jnp.arange(L) + off
    ok = (idx >= 0) & (idx < L)
    return jnp.where(ok, S[jnp.clip(idx, 0, L - 1)], 0)


def _pad_cols(M: jnp.ndarray, left: int = 0, right: int = 0) -> jnp.ndarray:
    parts = []
    if left:
        parts.append(jnp.zeros(M.shape[:-1] + (left,), M.dtype))
    parts.append(M)
    if right:
        parts.append(jnp.zeros(M.shape[:-1] + (right,), M.dtype))
    return jnp.concatenate(parts, axis=-1)


def fold_factors(bt: BoltzTables, S: jnp.ndarray, n: jnp.ndarray,
                 dtype=jnp.float32, sigma=None, allow=None) -> FoldFactors:
    """sigma may be a traced per-instance scalar (adaptive pf scale).

    `allow` (optional bool [L, L]) restricts the ensemble to structures whose
    pairs all satisfy allow[i, j] -- the pf-level hard-constraint mask built by
    ops.constraints (reference: Vienna fold_constrained pf_fold, called with
    the -c constraint string at src/ractip.cpp:270-290)."""
    L = S.shape[0]
    pair_tbl = jnp.asarray(np.array(PAIR_TYPE, np.int32))
    rtype_tbl = jnp.asarray(np.array(RTYPE, np.int32))
    f = lambda a: jnp.asarray(a, dtype)

    I = jnp.arange(L)[:, None]
    J = jnp.arange(L)[None, :]
    span = J - I - 1                       # unpaired bases inside (i, j)

    t = pair_tbl[S[:, None], S[None, :]]   # type of (i, j)
    rt = rtype_tbl[t]
    tv = t > 0
    if allow is not None:
        tv = tv & jnp.asarray(allow, bool)
    sig = jnp.asarray(bt.sigma if sigma is None else sigma, dtype)

    def srow(off):  # S[i + off], broadcast over rows
        return _sg(S, off)[:, None]

    def scol(off):  # S[j + off], broadcast over columns
        return _sg(S, off)[None, :]

    si1, sj1 = srow(1), scol(-1)           # inside-adjacent to pair (i, j)
    si2, sj2 = srow(2), scol(-2)
    sim1, sjp1 = srow(-1), scol(1)         # outside-adjacent

    def tr_at(di, dj):
        """Pair type of (j+dj, i+di) -- the reversed inner pair for specials."""
        a = jnp.broadcast_to(_sg(S, dj)[None, :], (L, L))
        b = jnp.broadcast_to(_sg(S, di)[:, None], (L, L))
        return pair_tbl[a, b]

    tr = tr_at(0, 0)

    # hairpin sizes with lxc extrapolation beyond 30
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
    valid_hp = tv & (span >= TURN)
    fhn = jnp.where(valid_hp, f(hp_ext)[span_c] * mism * tetra, 0.0)
    fhn = fhn * sig ** (span_c + 2).astype(dtype)

    pstk = jnp.where(tv, f(bt.stack)[t, tr_at(1, -1)] * sig ** 2, 0.0)
    p11 = jnp.where(tv, f(bt.int11)[t, tr_at(2, -2), si1, sj1] * sig ** 4, 0.0)
    p21a = jnp.where(tv, f(bt.int21)[t, tr_at(2, -3), si1, sj2, sj1] * sig ** 5, 0.0)
    p21b = jnp.where(tv, f(bt.int21)[tr_at(3, -2), t, sj1, si1, si2] * sig ** 5, 0.0)
    p22 = jnp.where(tv, f(bt.int22)[t, tr_at(3, -3), si1, si2, sj2, sj1] * sig ** 6, 0.0)
    pb15 = jnp.where(tv, f(bt.stack)[t, tr_at(2, -1)] * f(bt.bulge[1]) * sig ** 3, 0.0)
    pb13 = jnp.where(tv, f(bt.stack)[t, tr_at(1, -2)] * f(bt.bulge[1]) * sig ** 3, 0.0)

    tau = jnp.where(tv, f(bt.term_au)[t], 0.0)
    taur = jnp.where(tr > 0, f(bt.term_au)[tr], 0.0)
    mout = jnp.where(tv, f(bt.mismatch_i)[t, si1, sj1], 0.0)
    minn = jnp.where(tr > 0, f(bt.mismatch_i)[tr, sjp1, sim1], 0.0)

    d5 = f(bt.dangle5)
    d3 = f(bt.dangle3)
    fmb = jnp.where(tv, f(bt.ml_intern) * f(bt.term_au)[t]
                    * d5[t, sim1] * d3[t, sjp1], 0.0)
    fmc = jnp.where(tv, f(bt.ml_closing * bt.ml_intern) * f(bt.term_au)[rt]
                    * d3[rt, si1] * d5[rt, sj1], 0.0)
    fe = jnp.where(tv, f(bt.term_au)[t]
                   * jnp.where(I > 0, d5[t, sim1], 1.0)
                   * jnp.where(J < n - 1, d3[t, sjp1], 1.0), 0.0)

    return FoldFactors(
        fhn=fhn.astype(dtype), pstk=pstk.astype(dtype), p11=p11.astype(dtype),
        p21a=p21a.astype(dtype), p21b=p21b.astype(dtype), p22=p22.astype(dtype),
        pb15=pb15.astype(dtype), pb13=pb13.astype(dtype), tau=tau.astype(dtype),
        taur=taur.astype(dtype), mout=mout.astype(dtype), minn=minn.astype(dtype),
        fmb=fmb.astype(dtype), fmc=fmc.astype(dtype), fe=fe.astype(dtype),
    )


def _decay_matrix(bt: BoltzTables, L: int, dtype, sigma=None) -> jnp.ndarray:
    """D[i,k] = (sigma*ml_base)^(k-i) for k >= i, else 0.  Traced-sigma safe."""
    ik = np.arange(L)
    d = ik[None, :] - ik[:, None]
    if sigma is None:
        Dm = np.where(d >= 0, (bt.sigma * bt.ml_base) ** np.maximum(d, 0), 0.0)
        return jnp.asarray(Dm, dtype)
    smlb = jnp.asarray(sigma, dtype) * jnp.asarray(bt.ml_base, dtype)
    expo = jnp.asarray(np.maximum(d, 0), dtype)
    return jnp.where(jnp.asarray(d >= 0), smlb ** expo, 0.0)


def _sig_kernels(bt: BoltzTables, sigma, dtype):
    """(sig, smlb, w2k, bulge_k) with the per-instance sigma folded on device."""
    sig = jnp.asarray(bt.sigma if sigma is None else sigma, dtype)
    smlb = sig * jnp.asarray(bt.ml_base, dtype)
    e2 = np.add.outer(np.arange(W), np.arange(W)) + 2          # u1 + u2 + 2
    w2k = jnp.asarray(bt.w2_raw, dtype) * sig ** jnp.asarray(e2, dtype)
    em = np.arange(MAXLOOP + 1) + 2                            # m + 2
    bulge_k = jnp.asarray(bt.bulge_raw, dtype) * sig ** jnp.asarray(em, dtype)
    return sig, smlb, w2k, bulge_k


def inside(ff: FoldFactors, bt: BoltzTables, n: jnp.ndarray,
           dtype=jnp.float32, sigma=None) -> InsideState:
    L = ff.fhn.shape[0]
    sig, smlb, w2k, bulge_k = _sig_kernels(bt, sigma, dtype)
    D = _decay_matrix(bt, L, dtype, sigma)

    minn_pad = _pad_cols(ff.minn, left=W)
    taur_pad = _pad_cols(ff.taur, left=W)

    def body(j, st):
        qb, qm, qm1, qm2, q1, Qbuf, sat = st
        # Qbuf[:, b] = qb column (j - 31 + b)

        def col(M):
            return jax.lax.dynamic_slice(M, (0, j), (L, 1))[:, 0]

        minn_p = jax.lax.dynamic_slice(minn_pad, (0, j), (L, W))
        taur_p = jax.lax.dynamic_slice(taur_pad, (0, j), (L, W))
        Xp = Qbuf * minn_p
        Ap = Qbuf * taur_p

        # generic interior: sum_{u1,u2} w2[u1,u2] * X[i+1+u1, j-1-u2]
        gen = jnp.zeros((L,), dtype)
        for u1 in range(1, MAXLOOP):
            gen = gen + _shift_up(Xp, u1 + 1) @ w2k[u1, ::-1]  # b=30-u2
        gen = gen * col(ff.mout)

        # bulges m >= 2
        acol = Ap[:, W - 1]                     # qb*taur column j-1
        b5 = jnp.zeros((L,), dtype)
        for m in range(2, MAXLOOP + 1):
            b5 = b5 + bulge_k[m] * _shift_up(acol, m + 1)
        b3 = Ap[:, : W - 2] @ bulge_k[2:][::-1]  # b=0..28 <-> m=30..2
        bulges = col(ff.tau) * (b5 + _shift_up(b3, 1))

        qm1_prev = jnp.where(
            j >= 1, jax.lax.dynamic_slice(qm1, (0, jnp.maximum(j - 1, 0)), (L, 1))[:, 0], 0.0)
        qm2col = qm @ _shift_up(qm1_prev, 1)

        qbcol = (col(ff.fhn)
                 + gen + bulges
                 + col(ff.pstk) * _shift_up(Qbuf[:, W - 1], 1)
                 + col(ff.p11) * _shift_up(Qbuf[:, W - 2], 2)
                 + col(ff.p21a) * _shift_up(Qbuf[:, W - 3], 2)
                 + col(ff.p21b) * _shift_up(Qbuf[:, W - 2], 3)
                 + col(ff.p22) * _shift_up(Qbuf[:, W - 3], 3)
                 + col(ff.pb15) * _shift_up(Qbuf[:, W - 1], 2)
                 + col(ff.pb13) * _shift_up(Qbuf[:, W - 2], 1)
                 + col(ff.fmc) * sig ** 2 * _shift_up(qm2col, 1))

        qm1col = smlb * qm1_prev + qbcol * col(ff.fmb)
        qmcol = D @ qm1col + qm @ _shift_up(qm1col, 1)

        q1_prev = jnp.where(j >= 1, q1[jnp.maximum(j - 1, 0)], 1.0)
        q1pad = _shift_down(q1, 1).at[0].set(1.0)
        q1val = sig * q1_prev + jnp.sum(q1pad * qbcol * col(ff.fe))

        # saturating arithmetic: never let inf/nan poison the tables; the flag
        # drives the adaptive-sigma retry loop in fold()
        mx = jnp.maximum(jnp.maximum(jnp.max(qbcol), jnp.max(qmcol)), q1val)
        sat = sat | ~(mx < HUGE)
        hf = jnp.asarray(HUGE, dtype)
        qbcol, qm1col = jnp.minimum(qbcol, hf), jnp.minimum(qm1col, hf)
        qmcol, qm2col = jnp.minimum(qmcol, hf), jnp.minimum(qm2col, hf)
        q1val = jnp.minimum(q1val, hf)

        qb = jax.lax.dynamic_update_slice(qb, qbcol[:, None], (0, j))
        qm1 = jax.lax.dynamic_update_slice(qm1, qm1col[:, None], (0, j))
        qm = jax.lax.dynamic_update_slice(qm, qmcol[:, None], (0, j))
        qm2 = jax.lax.dynamic_update_slice(qm2, qm2col[:, None],
                                           (0, jnp.maximum(j - 1, 0)))
        q1 = q1.at[j].set(q1val)
        Qbuf = jnp.concatenate([Qbuf[:, 1:], qbcol[:, None]], axis=1)
        return (qb, qm, qm1, qm2, q1, Qbuf, sat)

    z = jnp.zeros((L, L), dtype)
    st = (z, z, z, z, jnp.zeros((L,), dtype), jnp.zeros((L, W), dtype),
          jnp.zeros((), bool))
    qb, qm, qm1, qm2, q1, _, sat = jax.lax.fori_loop(0, L, body, st)

    # last qm2 column (segment ending at L-1)
    qm2 = qm2.at[:, L - 1].set(qm @ _shift_up(qm1[:, L - 1], 1))

    zn = q1[n - 1]

    # suffix exterior: q2[i] ~ Z(i..n-1) * sigma^(n-i); q2[i>=n] = 1
    qbe = qb * ff.fe

    def body2(k, q2):
        i = L - 1 - k
        s = jnp.sum(qbe[i, :] * q2[1:])
        val = jnp.where(i >= n, 1.0, sig * q2[i + 1] + s)
        return q2.at[i].set(jnp.minimum(val, jnp.asarray(HUGE, dtype)))

    q2 = jax.lax.fori_loop(0, L, body2, jnp.ones((L + 1,), dtype))

    return InsideState(qb=qb, qm=qm, qm1=qm1, qm2=qm2, q1=q1, q2=q2, zn=zn,
                       sat=sat)


def outside(ff: FoldFactors, bt: BoltzTables, ins: InsideState, n: jnp.ndarray,
            dtype=jnp.float32, sigma=None) -> OutsideState:
    """Hand-written transpose of inside().  See module docstring for structure."""
    L = ff.fhn.shape[0]
    sig, smlb, w2k, bulge_k = _sig_kernels(bt, sigma, dtype)
    D = _decay_matrix(bt, L, dtype, sigma)

    qb, qm, qm1 = ins.qb, ins.qm, ins.qm1
    q1pad = _shift_down(ins.q1, 1).at[0].set(1.0)   # q1pad[i] = Z(0..i-1)

    # trailing-padded factor matrices for forward-offset column reads
    specials = [(_pad_cols(P, right=W), di, dj) for P, di, dj in (
        (ff.pstk, 1, 1), (ff.p11, 2, 2), (ff.p21a, 2, 3),
        (ff.p21b, 3, 2), (ff.p22, 3, 3), (ff.pb15, 2, 1), (ff.pb13, 1, 2))]

    def body(k, st):
        ob, om, om1, sm1, Obuf, OMbuf, OAbuf = st
        c = L - 1 - k
        # right-side buffers: Obuf[:, b] = ob column (c + 1 + b), b = 0..30

        def col(M):
            return jax.lax.dynamic_slice(M, (0, c), (L, 1))[:, 0]

        # om column c is complete; derive om1 direct contributions for column c
        omcol = col(om)
        om1col = col(om1) + D.T @ omcol + _shift_down(qm.T @ omcol, 1)
        sm1 = om1col + smlb * sm1           # total adjoint of qm1[:, c]

        # --- ob column c ---
        obcol = q1pad * col(ff.fe) * ins.q2[c + 1]          # exterior
        obcol = obcol + col(ff.fmb) * sm1                    # multiloop branch
        # generic interior (mirror): minn[i,c] * sum w2[u1,u2]*(ob*mout)[i-1-u1, c+1+u2]
        gen = jnp.zeros((L,), dtype)
        for u1 in range(1, MAXLOOP):
            gen = gen + _shift_down(OMbuf, u1 + 1) @ w2k[u1, :]   # b = u2 (w2[:,0]=0)
        obcol = obcol + gen * col(ff.minn)
        # bulges >= 2 (mirror)
        oa1 = OAbuf[:, 0]                                   # (ob*tau) column c+1
        b5 = jnp.zeros((L,), dtype)
        for m in range(2, MAXLOOP + 1):
            b5 = b5 + bulge_k[m] * _shift_down(oa1, m + 1)
        b3 = OAbuf[:, 2:W] @ bulge_k[2:]                    # b = m
        obcol = obcol + col(ff.taur) * (b5 + _shift_down(b3, 1))
        # small-loop specials (mirror): outer at (i-di, c+dj)
        for Ppad, di, dj in specials:
            pc = jax.lax.dynamic_slice(Ppad, (0, c + dj), (L, 1))[:, 0]
            obcol = obcol + _shift_down(pc * Obuf[:, dj - 1], di)

        # --- scatters feeding later (smaller-c) steps ---
        a = obcol * col(ff.fmc) * sig ** 2
        qm1_cm1 = jnp.where(
            c >= 1, jax.lax.dynamic_slice(qm1, (0, jnp.maximum(c - 1, 0)), (L, 1))[:, 0], 0.0)
        # d(qb[i,c] ML-term)/d(qm[i+1, m-1]):
        om = om + jnp.outer(_shift_down(a, 1), _shift_up(qm1_cm1, 1))
        # d(qb[i,c] ML-term)/d(qm1[m, c-1])  -> pending direct contribution
        pend = _shift_down(qm.T @ _shift_down(a, 1), 1)
        prev = jnp.where(
            c >= 1, jax.lax.dynamic_slice(om1, (0, jnp.maximum(c - 1, 0)), (L, 1))[:, 0], 0.0)
        om1 = jax.lax.dynamic_update_slice(om1, (prev + pend)[:, None],
                                           (0, jnp.maximum(c - 1, 0)))
        # d(qm[:,c])/d(qm matrix): rank-1 into columns < c
        om = om + jnp.outer(omcol, _shift_up(col(qm1), 1))

        obcol = jnp.minimum(obcol, jnp.asarray(HUGE, dtype))
        ob = jax.lax.dynamic_update_slice(ob, obcol[:, None], (0, c))
        om1 = jax.lax.dynamic_update_slice(om1, om1col[:, None], (0, c))
        Obuf = jnp.concatenate([obcol[:, None], Obuf[:, :-1]], axis=1)
        OMbuf = jnp.concatenate([(obcol * col(ff.mout))[:, None], OMbuf[:, :-1]], axis=1)
        OAbuf = jnp.concatenate([(obcol * col(ff.tau))[:, None], OAbuf[:, :-1]], axis=1)
        return (ob, om, om1, sm1, Obuf, OMbuf, OAbuf)

    z = jnp.zeros((L, L), dtype)
    st = (z, z, z, jnp.zeros((L,), dtype),
          jnp.zeros((L, W), dtype), jnp.zeros((L, W), dtype), jnp.zeros((L, W), dtype))
    ob, om, om1, _, _, _, _ = jax.lax.fori_loop(0, L, body, st)

    zn = ins.zn
    bpp = jnp.where(zn > 0, ins.qb * ob / zn, 0.0)
    return OutsideState(ob=ob, bpp=bpp)


def adaptive_inside(bt: BoltzTables, S: jnp.ndarray, n: jnp.ndarray,
                    dtype=jnp.float32, es0: float = SCALE_E0,
                    max_iter: int = 8, allow=None):
    """Inside pass with per-instance adaptive pf scaling.

    Retries the (saturating) inside DP with sigma = exp(-es/kT) until the
    scaled partition function lands in [ZLO, ZHI]: the TPU equivalent of
    Vienna's mfe-derived pf_scale.  When the first guess is in range (typical
    RNA) this costs exactly one inside pass.  Returns (es, InsideState).
    """
    kt = jnp.asarray(bt.kt, dtype)
    nf = jnp.maximum(jnp.asarray(n).astype(dtype), 1.0)

    def probe(es):
        sig = jnp.exp(-es / kt)
        ff = fold_factors(bt, S, n, dtype, sig, allow)
        return inside(ff, bt, n, dtype, sig)

    def good(ins):
        return (~ins.sat) & (ins.zn > ZLO) & (ins.zn < ZHI) \
            & jnp.isfinite(ins.zn)

    def cond(c):
        es, ins, it = c
        return (it < max_iter) & ~good(ins)

    def body(c):
        es, ins, it = c
        step = kt * 60.0 / nf        # shifts ln(zn) by ~60
        bad_hi = ins.sat | ~jnp.isfinite(ins.zn) | (ins.zn >= ZHI)
        es2 = jnp.where(bad_hi, es + step,
                        jnp.where(ins.zn > 0,
                                  es + kt * jnp.log(ins.zn) / nf,  # recenter
                                  es - step))
        return (es2, probe(es2), it + 1)

    es = jnp.asarray(es0, dtype)
    ins = probe(es)
    es, ins, _ = jax.lax.while_loop(cond, body, (es, ins, jnp.int32(0)))
    return es, ins


def fold(params: EnergyParams, S: jnp.ndarray, n: jnp.ndarray,
         dtype=jnp.float32, scale_e=None, allow=None):
    """Full inside/outside with adaptive pf scaling.

    Returns (InsideState, OutsideState).  Pass scale_e to pin the per-base
    scale energy (cal/mol) instead of adapting (e.g. reuse across decoys)."""
    bt = get_boltz(params)
    if scale_e is None:
        es, ins = adaptive_inside(bt, S, n, dtype, allow=allow)
        sig = jnp.exp(-es / jnp.asarray(bt.kt, dtype))
        ff = fold_factors(bt, S, n, dtype, sig, allow)
    else:
        sig = jnp.exp(-jnp.asarray(scale_e, dtype) / jnp.asarray(bt.kt, dtype))
        ff = fold_factors(bt, S, n, dtype, sig, allow)
        ins = inside(ff, bt, n, dtype, sig)
    out = outside(ff, bt, ins, n, dtype, sig)
    return ins, out


def log_partition(params: EnergyParams, S: jnp.ndarray, n: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    """ln Z (unscaled).  ln Z = ln zn + n * es / kT (sigma = exp(-es/kT))."""
    bt = get_boltz(params)
    es, ins = adaptive_inside(bt, S, n, dtype)
    return jnp.log(ins.zn) + jnp.asarray(n).astype(dtype) * es \
        / jnp.asarray(bt.kt, dtype)


def base_pair_probs(params: EnergyParams, S: jnp.ndarray, n: jnp.ndarray,
                    dtype=jnp.float32, allow=None) -> jnp.ndarray:
    """[L, L] base-pair probability matrix (upper triangle)."""
    _, out = fold(params, S, n, dtype, allow=allow)
    return out.bpp
