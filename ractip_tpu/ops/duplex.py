"""Duplex (inter-molecular) partition function and hybridization probabilities.

Equivalent of the reference's pf_duplex inside/outside DP
(reference src/pf_duplex.c:67-206 and the pre-2.0 branch :305-393): the ensemble
is all "pure duplexes" -- chains of inter-strand pairs (i_1<...<i_p in s1 paired
with j_1>...>j_p in s2) where consecutive pairs form stacks / bulges / interior
loops with <= MAXLOOP unpaired bases, plus a duplex-initiation term and
dangle/terminal-AU contributions at both helix ends.  pr[i, j] is the posterior
probability that (i, j) pairs given the strands form a duplex.

TPU design: all pair-dependent energies live in precomputed [L1, L2] factor
matrices.  The forward (and mirrored backward) fill runs as a row scan whose
banded 31x31 generic-loop stencil is one XLA convolution over a rolling row
window.  Chain weights span hundreds of e-folds (the reference uses log-space
doubles, pf_duplex.c:33-40); here each row is adaptively renormalized and a
per-row log-offset is carried, keeping everything in float32-friendly linear
algebra while remaining exact in log space.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAXLOOP, PAIR_TYPE, RTYPE
from ..params.boltz import BoltzTables, get_boltz
from ..params.tables import EnergyParams

W = MAXLOOP + 1


def _sg(S: jnp.ndarray, off: int) -> jnp.ndarray:
    L = S.shape[0]
    idx = jnp.arange(L) + off
    ok = (idx >= 0) & (idx < L)
    return jnp.where(ok, S[jnp.clip(idx, 0, L - 1)], 0)


def _shift_j(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[..., j] = v[..., j+k] (zero fill), static k (may be negative)."""
    L = v.shape[-1]
    if k == 0:
        return v
    if k > 0:
        k = min(k, L)
        pad = jnp.zeros(v.shape[:-1] + (k,), v.dtype)
        return jnp.concatenate([v[..., k:], pad], axis=-1)
    k = min(-k, L)
    pad = jnp.zeros(v.shape[:-1] + (k,), v.dtype)
    return jnp.concatenate([pad, v[..., : L - k]], axis=-1)


class DuplexFactors(NamedTuple):
    """Factor matrices for one sweep direction.

    The *forward* sweep anchors loops at the inner/new pair (i, j) and reads the
    previous pair at (i-di, j+dj); the *backward* sweep anchors at the outer
    pair and reads the next pair at (i+di, j-dj).  Both are instances of this
    structure with different tables and a mirrored stencil direction.
    """

    start: jnp.ndarray   # chain start factor at (i, j) (init or closing end)
    close: jnp.ndarray   # chain end factor (used for the total sum)
    mm_here: jnp.ndarray  # generic-loop mismatch factor at the anchored pair
    mm_other: jnp.ndarray  # generic-loop mismatch folded into the window buffer
    pstk: jnp.ndarray
    p11: jnp.ndarray
    p21a: jnp.ndarray
    p21b: jnp.ndarray
    p22: jnp.ndarray
    pb1a: jnp.ndarray
    pb1b: jnp.ndarray
    tau: jnp.ndarray


def _common(bt: BoltzTables, S1, S2, dtype):
    L1, L2 = S1.shape[0], S2.shape[0]
    pair_tbl = jnp.asarray(np.array(PAIR_TYPE, np.int32))
    rtype_tbl = jnp.asarray(np.array(RTYPE, np.int32))

    def t_at(di, dj):
        a = jnp.broadcast_to(_sg(S1, di)[:, None], (L1, L2))
        b = jnp.broadcast_to(_sg(S2, dj)[None, :], (L1, L2))
        return pair_tbl[a, b]

    t = t_at(0, 0)
    return t, rtype_tbl[t], t_at


def duplex_factors_fw(bt: BoltzTables, S1, S2, n1, n2, dtype=jnp.float32) -> DuplexFactors:
    """Forward factors: loops between previous pair (k,l)=(i-di, j+dj) and (i,j).

    Energy call pattern: reference src/pf_duplex.c:332-333 --
    LoopEnergy(i-k-1, l-j-1, t(k,l), rtype[t(i,j)], S1[k+1], S2[l-1], S1[i-1], S2[j+1]).
    """
    L1, L2 = S1.shape[0], S2.shape[0]
    t, rt, t_at = _common(bt, S1, S2, dtype)
    tv = t > 0
    f = lambda a: jnp.asarray(a, dtype)
    I = jnp.arange(L1)[:, None]
    J = jnp.arange(L2)[None, :]
    s1r = lambda off: _sg(S1, off)[:, None]
    s2c = lambda off: _sg(S2, off)[None, :]
    d5, d3, tau_t = f(bt.dangle5), f(bt.dangle3), f(bt.term_au)

    start = jnp.where(tv, f(bt.duplex_init) * tau_t[t]
                      * jnp.where(I > 0, d5[t, s1r(-1)], 1.0)
                      * jnp.where(J < n2 - 1, d3[t, s2c(1)], 1.0), 0.0)
    close = jnp.where(tv, tau_t[t]
                      * jnp.where(I < n1 - 1, d3[rt, s1r(1)], 1.0)
                      * jnp.where(J > 0, d5[rt, s2c(-1)], 1.0), 0.0)
    mm_here = jnp.where(tv, f(bt.mismatch_i)[rt, s2c(1), s1r(-1)], 0.0)
    mm_other = jnp.where(tv, f(bt.mismatch_i)[t, s1r(1), s2c(-1)], 0.0)
    pstk = jnp.where(tv, f(bt.stack)[t_at(-1, 1), rt], 0.0)
    p11 = jnp.where(tv, f(bt.int11)[t_at(-2, 2), rt, s1r(-1), s2c(1)], 0.0)
    p21a = jnp.where(tv, f(bt.int21)[t_at(-2, 3), rt, s1r(-1), s2c(1), s2c(2)], 0.0)
    p21b = jnp.where(tv, f(bt.int21)[rt, t_at(-3, 2), s2c(1), s1r(-2), s1r(-1)], 0.0)
    p22 = jnp.where(tv, f(bt.int22)[t_at(-3, 3), rt, s1r(-2), s1r(-1), s2c(1), s2c(2)], 0.0)
    pb1a = jnp.where(tv, f(bt.stack)[t_at(-2, 1), rt] * f(bt.bulge[1]), 0.0)
    pb1b = jnp.where(tv, f(bt.stack)[t_at(-1, 2), rt] * f(bt.bulge[1]), 0.0)
    tau = jnp.where(tv, tau_t[t], 0.0)
    cast = lambda a: a.astype(dtype)
    return DuplexFactors(*map(cast, (start, close, mm_here, mm_other, pstk, p11,
                                     p21a, p21b, p22, pb1a, pb1b, tau)))


def duplex_factors_bk(bt: BoltzTables, S1, S2, n1, n2, dtype=jnp.float32) -> DuplexFactors:
    """Backward factors: loops between (i,j) (outer) and next pair (i+di, j-dj)."""
    L1, L2 = S1.shape[0], S2.shape[0]
    t, rt, t_at = _common(bt, S1, S2, dtype)
    tv = t > 0
    f = lambda a: jnp.asarray(a, dtype)
    I = jnp.arange(L1)[:, None]
    J = jnp.arange(L2)[None, :]
    s1r = lambda off: _sg(S1, off)[:, None]
    s2c = lambda off: _sg(S2, off)[None, :]
    d5, d3, tau_t = f(bt.dangle5), f(bt.dangle3), f(bt.term_au)
    rt_in = lambda di, dj: jnp.asarray(np.array(RTYPE, np.int32))[t_at(di, dj)]

    # start of the backward sweep = the closing (3') end; close = the init end
    start = jnp.where(tv, tau_t[t]
                      * jnp.where(I < n1 - 1, d3[rt, s1r(1)], 1.0)
                      * jnp.where(J > 0, d5[rt, s2c(-1)], 1.0), 0.0)
    close = jnp.where(tv, f(bt.duplex_init) * tau_t[t]
                      * jnp.where(I > 0, d5[t, s1r(-1)], 1.0)
                      * jnp.where(J < n2 - 1, d3[t, s2c(1)], 1.0), 0.0)
    mm_here = jnp.where(tv, f(bt.mismatch_i)[t, s1r(1), s2c(-1)], 0.0)
    mm_other = jnp.where(tv, f(bt.mismatch_i)[rt, s2c(1), s1r(-1)], 0.0)
    pstk = jnp.where(tv, f(bt.stack)[t, rt_in(1, -1)], 0.0)
    p11 = jnp.where(tv, f(bt.int11)[t, rt_in(2, -2), s1r(1), s2c(-1)], 0.0)
    p21a = jnp.where(tv, f(bt.int21)[t, rt_in(2, -3), s1r(1), s2c(-2), s2c(-1)], 0.0)
    p21b = jnp.where(tv, f(bt.int21)[rt_in(3, -2), t, s2c(-1), s1r(1), s1r(2)], 0.0)
    p22 = jnp.where(tv, f(bt.int22)[t, rt_in(3, -3), s1r(1), s1r(2), s2c(-2), s2c(-1)], 0.0)
    pb1a = jnp.where(tv, f(bt.stack)[t, rt_in(2, -1)] * f(bt.bulge[1]), 0.0)
    pb1b = jnp.where(tv, f(bt.stack)[t, rt_in(1, -2)] * f(bt.bulge[1]), 0.0)
    tau = jnp.where(tv, tau_t[t], 0.0)
    cast = lambda a: a.astype(dtype)
    return DuplexFactors(*map(cast, (start, close, mm_here, mm_other, pstk, p11,
                                     p21a, p21b, p22, pb1a, pb1b, tau)))


def _gen_kernel(bt: BoltzTables, dtype) -> jnp.ndarray:
    """[1,1,31,32] conv kernel: K[W-1-u1, u2+1] = w2_raw[u1, u2].

    Row buffers store the row at distance d (= u1+1) from the current row at
    index W-d, so the kernel row for u1 unpaired bases on s1 is W-1-u1.
    """
    K = np.zeros((W, W + 1))
    for u1 in range(1, MAXLOOP):
        for u2 in range(1, MAXLOOP + 1 - u1):
            K[W - 1 - u1, u2 + 1] = bt.w2_raw[u1, u2]
    return jnp.asarray(K[None, None], dtype)


def _sweep(ff: DuplexFactors, bt: BoltzTables, dtype, reverse: bool):
    """Row scan computing chain sums.  reverse=False: rows ascending, window
    reads rows above with positive j-shifts; reverse=True: rows descending,
    reads rows below with negative j-shifts (factors must match direction).

    Returns (M, lsc): M[i, :] row-normalized values, lsc[i] log scale so the
    true value is M[i, j] * exp(lsc[i]).
    """
    L1, L2 = ff.start.shape
    Kgen = _gen_kernel(bt, dtype)
    bcoef = np.zeros(W)
    for m in range(2, MAXLOOP + 1):
        bcoef[W - 1 - m] = bt.bulge_raw[m]   # buffer row at distance m+1
    bcoef = jnp.asarray(bcoef, dtype)
    bk_raw = jnp.asarray(bt.bulge_raw, dtype)
    sgn = -1 if reverse else 1

    def shifted(v, k):
        return _shift_j(v, sgn * k)

    def body(step, st):
        M, lsc, Fbuf, FAbuf, FTbuf, off = st
        i = (L1 - 1 - step) if reverse else step

        def row(Mx):
            return jax.lax.dynamic_slice(Mx, (i, 0), (1, L2))[0]

        # generic interior via one conv over the (fw * mm_other) window.
        # Buffer index -> row distance is identical in both sweep directions
        # (index W-d holds the row at distance d), so only the j axis flips.
        pad = jnp.zeros((W, W + 1), dtype)
        if reverse:
            FAp = jnp.concatenate([FAbuf[:, ::-1], pad], axis=1)
        else:
            FAp = jnp.concatenate([FAbuf, pad], axis=1)
        out = jax.lax.conv_general_dilated(
            FAp[None, None], Kgen, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0, 0]
        gen = out[:L2]
        if reverse:
            gen = gen[::-1]
        gen = gen * row(ff.mm_here)

        # bulges m >= 2 on s1: previous row i -/+ (1+m), j shifted by 1
        b1 = shifted(bcoef @ FTbuf, 1)
        # bulges m >= 2 on s2: previous row i -/+ 1, j shifted by m+1
        rT = FTbuf[W - 1]
        b2 = jnp.zeros((L2,), dtype)
        for m in range(2, MAXLOOP + 1):
            b2 = b2 + bk_raw[m] * shifted(rT, m + 1)
        bulges = row(ff.tau) * (b1 + b2)

        r1, r2, r3 = Fbuf[W - 1], Fbuf[W - 2], Fbuf[W - 3]
        val = (row(ff.start) * jnp.exp(-off)
               + gen + bulges
               + row(ff.pstk) * shifted(r1, 1)
               + row(ff.p11) * shifted(r2, 2)
               + row(ff.p21a) * shifted(r2, 3)
               + row(ff.p21b) * shifted(r3, 2)
               + row(ff.p22) * shifted(r3, 3)
               + row(ff.pb1a) * shifted(r2, 1)
               + row(ff.pb1b) * shifted(r1, 2))

        # adaptive renormalization: keep window values O(1)
        m0 = jnp.maximum(jnp.max(val), jnp.asarray(1e-30, dtype))
        scale = jnp.where(m0 > 1e4, m0, jnp.asarray(1.0, dtype))
        val_n = val / scale
        newoff = off + jnp.log(scale)

        M = jax.lax.dynamic_update_slice(M, val_n[None, :], (i, 0))
        lsc = lsc.at[i].set(newoff)
        Fbuf = jnp.concatenate([Fbuf[1:] / scale, val_n[None, :]], axis=0)
        FAbuf = jnp.concatenate([FAbuf[1:] / scale,
                                 (val_n * row(ff.mm_other))[None, :]], axis=0)
        FTbuf = jnp.concatenate([FTbuf[1:] / scale,
                                 (val_n * row(ff.tau))[None, :]], axis=0)
        return (M, lsc, Fbuf, FAbuf, FTbuf, newoff)

    z2 = jnp.zeros((W, L2), dtype)
    st = (jnp.zeros((L1, L2), dtype), jnp.zeros((L1,), dtype), z2, z2, z2,
          jnp.zeros((), dtype))
    M, lsc, *_ = jax.lax.fori_loop(0, L1, body, st)
    return M, lsc


class DuplexResult(NamedTuple):
    pr: jnp.ndarray      # [L1, L2] posterior pair probabilities
    log_zd: jnp.ndarray  # ln(duplex partition function), unscaled


def duplex(params: EnergyParams, S1: jnp.ndarray, S2: jnp.ndarray,
           n1: jnp.ndarray, n2: jnp.ndarray, dtype=jnp.float32,
           use_pallas: bool | None = None,
           pallas_interpret: bool = False) -> DuplexResult:
    """use_pallas=None auto-selects the Pallas TPU sweep on TPU backends and
    the pure-jnp sweep elsewhere; both compute identical math."""
    if use_pallas is None:
        # the tunneled TPU registers its backend as "axon"
        use_pallas = jax.default_backend() in ("tpu", "axon")
    bt = get_boltz(params)
    ffw = duplex_factors_fw(bt, S1, S2, n1, n2, dtype)
    fbk = duplex_factors_bk(bt, S1, S2, n1, n2, dtype)
    if use_pallas:
        from .duplex_pallas import sweep_pallas
        fw, lfw = sweep_pallas(ffw, bt, dtype, reverse=False,
                               interpret=pallas_interpret)
        bk, lbk = sweep_pallas(fbk, bt, dtype, reverse=True,
                               interpret=pallas_interpret)
    else:
        fw, lfw = _sweep(ffw, bt, dtype, reverse=False)
        bk, lbk = _sweep(fbk, bt, dtype, reverse=True)

    # log Z from the forward sweep: sum_ij fw[i,j] * close[i,j]
    rowsum = jnp.sum(fw * ffw.close, axis=1)
    mx = jnp.max(lfw)
    zd = jnp.sum(rowsum * jnp.exp(lfw - mx))
    log_zd = jnp.log(jnp.maximum(zd, jnp.finfo(dtype).tiny)) + mx

    logpr = (jnp.log(jnp.maximum(fw, jnp.finfo(dtype).tiny)) + lfw[:, None]
             + jnp.log(jnp.maximum(bk, jnp.finfo(dtype).tiny)) + lbk[:, None]
             - log_zd)
    pr = jnp.where((fw > 0) & (bk > 0), jnp.exp(logpr), 0.0)
    return DuplexResult(pr=pr, log_zd=log_zd)


def hybrid_probs(params: EnergyParams, S1, S2, n1, n2, dtype=jnp.float32,
                 **kw):
    """[L1, L2] duplex pair posteriors (the reference's hp_ under --duplex)."""
    return duplex(params, S1, S2, n1, n2, dtype, **kw).pr
