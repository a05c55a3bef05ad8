"""Boltzmann-factor matrices as one-hot bilinear MATMULS (MXU) instead of
multi-index table gathers.

Every factor matrix of ops.mccaskill.fold_factors / ops.cofold.co_factors is
a function F[i, j] = T[code_i(S), code_j(S)] x elementwise(i, j) where
code_i/code_j depend on at most 4 consecutive bases around i / j.  XLA lowers
the reference formulation's 4-6-index gathers ([B, L, L] lookups into
int11/int21/int22/mismatch tables) extremely poorly on TPU (~190 ms for
B=128, L=96 -- the single largest cost of the batched pipeline).  Here each
factor becomes

    F = OA @ (T @ OB.T)          (natural [L_i, L_j] orientation)
    F' = OB @ (T.T @ OA.T)       (transposed (L_j, L_i) -- the layout the
                                  Pallas scan kernels stream, for free)

with OA/OB tiny one-hot code matrices ([L, 25/125/625]) and T precomputed
numpy constants -- a few MXU matmuls totalling ~100 MFLOP per instance.

Semantics are IDENTICAL to fold_factors/co_factors (reference: the Vienna-1.8
loop-energy rules of reference src/pf_duplex.c:305-393 applied over BL*
tables); tests/test_factors_mm.py asserts exact agreement.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PAIR_TYPE, TURN
from ..params.boltz import BoltzTables
from .cofold import CoFactors
from .mccaskill import FoldFactors

F32 = jnp.float32
_P = np.array(PAIR_TYPE, np.int32)


def _codes(k: int):
    """All base tuples of length k as columns: returns tuple of k arrays
    [5^k] with tup[t] = digit t (most-significant first)."""
    return np.unravel_index(np.arange(5 ** k), (5,) * k)


@dataclasses.dataclass(frozen=True)
class BilTables:
    """Precomputed bilinear factor tables (numpy float32).

    Row codes encode (S_i .. S_{i+k-1}) MSB-first; column codes encode
    (S_{j-k+1} .. S_j) MSB-first; mid codes encode (S_{x-1}, S_x, S_{x+1}).
    """

    tv: np.ndarray       # [5, 5]    pairable indicator
    tau: np.ndarray      # [5, 5]    TerminalAU of (i, j)
    taur: np.ndarray     # [5, 5]    TerminalAU of (j, i), masked pairable
    stk: np.ndarray      # [25, 25]  stack
    mh: np.ndarray       # [25, 25]  hairpin mismatch
    mout: np.ndarray     # [25, 25]  interior mismatch, outer
    fmc: np.ndarray      # [25, 25]  multiloop closing
    p11: np.ndarray      # [125, 125]
    pb15: np.ndarray     # [125, 25]
    pb13: np.ndarray     # [25, 125]
    p21a: np.ndarray     # [125, 625]
    p21b: np.ndarray     # [625, 125]
    p22: np.ndarray      # [625, 625]
    minn: np.ndarray     # [125, 125] interior mismatch, inner (mid codes)
    fmb: np.ndarray      # [125, 125] multiloop branch (mid codes)
    fe: np.ndarray       # [125, 125] exterior stem (mid codes)
    # cofold extras (cut-conditional dangle split)
    d3r: np.ndarray      # [25, 5]   d3[rt, S_{i+1}]
    d5r: np.ndarray      # [5, 25]   d5[rt, S_{j-1}]
    d5B: np.ndarray      # [125, 125] d5[t, S_{i-1}] (mid codes)
    d3B: np.ndarray      # [125, 125] d3[t, S_{j+1}] (mid codes)
    tetra_keys: np.ndarray    # [T] special 6-mer codes
    tetra_vals: np.ndarray    # [T] bonus factors


_BIL_CACHE: dict = {}


def get_bil(bt: BoltzTables) -> BilTables:
    key = id(bt)
    hit = _BIL_CACHE.get(key)
    if hit is not None:
        return hit

    f32 = lambda a: np.asarray(a, np.float32)
    tau_t = f32(bt.term_au)
    d5, d3 = f32(bt.dangle5), f32(bt.dangle3)

    x = np.arange(5)
    tv = f32(_P > 0)
    tau = tau_t[_P]
    taur = tau_t[_P.T] * (_P.T > 0)

    a0, a1 = _codes(2)
    b0, b1 = _codes(2)
    A, B = a0[:, None], b0[None, :]
    A1, B1 = a1[:, None], b1[None, :]
    t2 = _P[A, B1]
    stk = f32(bt.stack)[t2, _P[B, A1]]
    mh = f32(bt.mismatch_h)[t2, A1, B]
    mout = f32(bt.mismatch_i)[t2, A1, B]
    rt2 = _P[B1, A]
    fmc = f32(bt.ml_closing * bt.ml_intern) * tau_t[rt2] \
        * d3[rt2, A1] * d5[rt2, B]
    d3r = d3[_P[x[None, :], A], A1[:, :1]]          # [25, 5]: d3[P[y,a0], a1]
    c0, c1 = _codes(2)
    d5r = d5[_P[c1[None, :], x[:, None]], c0[None, :]]   # [5, 25]

    a0, a1, a2 = _codes(3)
    b0, b1, b2 = _codes(3)
    A0, A1, A2 = a0[:, None], a1[:, None], a2[:, None]
    B0, B1, B2 = b0[None, :], b1[None, :], b2[None, :]
    p11 = f32(bt.int11)[_P[A0, B2], _P[B0, A2], A1, B1]
    # pb15 rows are 3-codes, cols 2-codes (and vice versa for pb13)
    e0, e1 = _codes(2)
    E0, E1 = e0[None, :], e1[None, :]
    pb15 = f32(bt.stack)[_P[A0, E1], _P[E0, A2]] * np.float32(bt.bulge[1])
    F0, F1, F2 = b0[None, :], b1[None, :], b2[None, :]
    g0, g1 = _codes(2)
    G0, G1 = g0[:, None], g1[:, None]
    pb13 = f32(bt.stack)[_P[G0, F2], _P[F0, G1]] * np.float32(bt.bulge[1])

    # mid-code tables: row (S_{i-1}, S_i, S_{i+1}), col (S_{j-1}, S_j, S_{j+1})
    m0, m1, m2 = _codes(3)
    M0, M1, M2 = m0[:, None], m1[:, None], m2[:, None]
    N0, N1, N2 = m0[None, :], m1[None, :], m2[None, :]
    trm = _P[N1, M1]
    minn = f32(bt.mismatch_i)[trm, N2, M0] * (trm > 0)
    tm = _P[M1, N1]
    fmb = f32(bt.ml_intern) * tau_t[tm] * d5[tm, M0] * d3[tm, N2]
    fe = tau_t[tm] * d5[tm, M0] * d3[tm, N2]
    d5B = d5[tm, M0]
    d3B = d3[tm, N2]

    a0, a1, a2, a3 = _codes(4)
    b0, b1, b2, b3 = _codes(4)
    A0, A1, A2, A3 = a0[:, None], a1[:, None], a2[:, None], a3[:, None]
    B0, B1, B2, B3 = b0[None, :], b1[None, :], b2[None, :], b3[None, :]
    h0, h1, h2 = _codes(3)
    H0, H1, H2 = h0[None, :], h1[None, :], h2[None, :]
    i0, i1, i2 = _codes(3)
    I0, I1, I2 = i0[:, None], i1[:, None], i2[:, None]
    # p21a: rows 3-codes, cols 4-codes; p21b: rows 4-codes, cols 3-codes
    p21a = f32(bt.int21)[_P[I0, B3], _P[B0, I2], I1, B1, B2]
    p21b = f32(bt.int21)[_P[H0, A3], _P[A0, H2], H1, A1, A2]
    p22 = f32(bt.int22)[_P[A0, B3], _P[B0, A3], A1, A2, B1, B2]

    keys = np.nonzero(bt.tetra != 1.0)[0].astype(np.int32)
    vals = f32(bt.tetra[keys])

    out = BilTables(
        tv=tv, tau=f32(tau), taur=f32(taur), stk=stk, mh=mh, mout=mout,
        fmc=f32(fmc), p11=p11, pb15=pb15, pb13=pb13, p21a=p21a, p21b=p21b,
        p22=p22, minn=f32(minn), fmb=f32(fmb), fe=f32(fe), d3r=f32(d3r),
        d5r=f32(d5r), d5B=f32(d5B), d3B=f32(d3B), tetra_keys=keys,
        tetra_vals=vals)
    _BIL_CACHE[key] = out
    return out


def _sg(S, off):
    L = S.shape[0]
    idx = jnp.arange(L) + off
    ok = (idx >= 0) & (idx < L)
    return jnp.where(ok, S[jnp.clip(idx, 0, L - 1)], 0)


class _Codes:
    """One-hot code matrices for one sequence."""

    def __init__(self, S):
        s = lambda off: _sg(S, off)
        oh = lambda v, k: jax.nn.one_hot(v, 5 ** k, dtype=F32)
        self.a1 = oh(S, 1)
        self.a2 = oh(S * 5 + s(1), 2)
        self.a3 = oh((S * 5 + s(1)) * 5 + s(2), 3)
        self.a4 = oh(((S * 5 + s(1)) * 5 + s(2)) * 5 + s(3), 4)
        self.b1 = self.a1
        self.b2 = oh(s(-1) * 5 + S, 2)
        self.b3 = oh(s(-2) * 25 + s(-1) * 5 + S, 3)
        self.b4 = oh(s(-3) * 125 + s(-2) * 25 + s(-1) * 5 + S, 4)
        self.m = oh((s(-1) * 5 + S) * 5 + s(1), 3)
        self.key6 = (((((S * 5 + s(1)) * 5 + s(2)) * 5 + s(3)) * 5 + s(4))
                     * 5 + s(5))


def _bil(c: _Codes, T, ra: str, cb: str, transposed: bool):
    """OA_ra @ T @ OB_cb.T in the requested orientation."""
    OA = getattr(c, ra)
    OB = getattr(c, cb)
    Tj = jnp.asarray(T)
    if transposed:
        return (OB @ Tj.T) @ OA.T
    return OA @ (Tj @ OB.T)


def _tetra_vec(bil: BilTables, key6):
    """tetraloop bonus per start position (product over ~30 special 6-mers)."""
    t = jnp.ones(key6.shape, F32)
    for k, v in zip(bil.tetra_keys.tolist(), bil.tetra_vals.tolist()):
        t = t * jnp.where(key6 == k, jnp.float32(v), 1.0)
    return t


def _span_tables(bt: BoltzTables, L: int, transposed: bool):
    """Constant [L, L] matrices: span, hairpin-size factor."""
    I = np.arange(L)[:, None]
    J = np.arange(L)[None, :]
    span = (J - I - 1) if not transposed else (I - J - 1)
    sizes = np.arange(max(L + 1, 32), dtype=np.float64)
    hp_ext = np.zeros(max(L + 1, 32))
    hp_ext[:31] = bt.hairpin
    hp_ext[31:] = bt.hairpin[30] * (sizes[31:] / 30.0) ** (
        -10.0 * bt.lxc / bt.kt)
    span_c = np.clip(span, 0, L)
    return (jnp.asarray(span, jnp.int32),
            jnp.asarray(hp_ext[span_c], F32))


def fold_factors_mm(bt: BoltzTables, S, n, sigma, allow=None,
                    transposed: bool = False) -> FoldFactors:
    """Drop-in fold_factors via bilinear matmuls (f32).

    With transposed=True each factor comes back as F.T (layout (L_j, L_i)),
    computed natively by swapping the matmul operands -- no transposes.
    allow (natural-orientation [L, L] pair mask) is only supported
    untransposed."""
    bil = get_bil(bt)
    L = S.shape[0]
    c = _Codes(S)
    T = transposed
    sig = jnp.asarray(sigma, F32)
    span, hspan = _span_tables(bt, L, T)

    def brI(v):   # broadcast a per-i vector
        return v[None, :] if T else v[:, None]

    def brJ(v):
        return v[:, None] if T else v[None, :]

    B = lambda tbl, ra, cb: _bil(c, tbl, ra, cb, T)

    tvb = B(bil.tv, "a1", "b1") > 0.5
    if allow is not None:
        al = jnp.asarray(allow, bool)
        tvb = tvb & (al.T if T else al)

    mism = jnp.where(span == 3, B(bil.tau, "a1", "b1"),
                     B(bil.mh, "a2", "b2"))
    tet = jnp.where(span == 4, brI(_tetra_vec(bil, c.key6)), 1.0)
    fhn = jnp.where(tvb & (span >= TURN), hspan * mism * tet, 0.0)
    fhn = fhn * sig ** (jnp.clip(span, 0, L) + 2).astype(F32)

    z = lambda m: jnp.where(tvb, m, 0.0)
    pstk = z(B(bil.stk, "a2", "b2") * sig ** 2)
    p11 = z(B(bil.p11, "a3", "b3") * sig ** 4)
    p21a = z(B(bil.p21a, "a3", "b4") * sig ** 5)
    p21b = z(B(bil.p21b, "a4", "b3") * sig ** 5)
    p22 = z(B(bil.p22, "a4", "b4") * sig ** 6)
    pb15 = z(B(bil.pb15, "a3", "b2") * sig ** 3)
    pb13 = z(B(bil.pb13, "a2", "b3") * sig ** 3)
    tau = z(B(bil.tau, "a1", "b1"))
    taur = B(bil.taur, "a1", "b1")              # masked pairable in-table
    mout = z(B(bil.mout, "a2", "b2"))
    minn = B(bil.minn, "m", "m")                # masked pairable in-table
    fmb = z(B(bil.fmb, "m", "m"))
    fmc = z(B(bil.fmc, "a2", "b2"))
    fe = z(B(bil.fe, "m", "m"))

    return FoldFactors(fhn=fhn, pstk=pstk, p11=p11, p21a=p21a, p21b=p21b,
                       p22=p22, pb15=pb15, pb13=pb13, tau=tau, taur=taur,
                       mout=mout, minn=minn, fmb=fmb, fmc=fmc, fe=fe)


def co_factors_mm(bt: BoltzTables, S, n, cut, sigma, allow=None,
                  transposed: bool = False) -> CoFactors:
    """Drop-in co_factors via bilinear matmuls (f32); see fold_factors_mm."""
    bil = get_bil(bt)
    L = S.shape[0]
    c = _Codes(S)
    T = transposed
    sig = jnp.asarray(sigma, F32)
    ct = jnp.asarray(cut, jnp.int32)
    span, hspan = _span_tables(bt, L, T)
    Iv = jnp.arange(L)
    I = Iv[None, :] if T else Iv[:, None]
    J = Iv[:, None] if T else Iv[None, :]

    def brI(v):
        return v[None, :] if T else v[:, None]

    B = lambda tbl, ra, cb: _bil(c, tbl, ra, cb, T)

    tvb = B(bil.tv, "a1", "b1") > 0.5
    if allow is not None:
        al = jnp.asarray(allow, bool)
        tvb = tvb & (al.T if T else al)
    same = ~((I < ct) & (ct <= J))
    spanning = (I < ct) & (ct <= J) & tvb

    def m5(d):
        return ~((I < ct) & (ct <= I + d))

    def m3(d):
        return ~((J - d < ct) & (ct <= J))

    mism = jnp.where(span == 3, B(bil.tau, "a1", "b1"),
                     B(bil.mh, "a2", "b2"))
    tet = jnp.where(span == 4, brI(_tetra_vec(bil, c.key6)), 1.0)
    fhn = jnp.where(tvb & (span >= TURN) & same, hspan * mism * tet, 0.0)
    fhn = fhn * sig ** (jnp.clip(span, 0, L) + 2).astype(F32)

    def zm(m, d5_, d3_):
        return jnp.where(tvb & m5(d5_) & m3(d3_), m, 0.0)

    z = lambda m: jnp.where(tvb, m, 0.0)
    pstk = zm(B(bil.stk, "a2", "b2") * sig ** 2, 1, 1)
    p11 = zm(B(bil.p11, "a3", "b3") * sig ** 4, 2, 2)
    p21a = zm(B(bil.p21a, "a3", "b4") * sig ** 5, 2, 3)
    p21b = zm(B(bil.p21b, "a4", "b3") * sig ** 5, 3, 2)
    p22 = zm(B(bil.p22, "a4", "b4") * sig ** 6, 3, 3)
    pb15 = zm(B(bil.pb15, "a3", "b2") * sig ** 3, 2, 1)
    pb13 = zm(B(bil.pb13, "a2", "b3") * sig ** 3, 1, 2)
    tau = z(B(bil.tau, "a1", "b1"))
    taur = B(bil.taur, "a1", "b1")
    mout = z(B(bil.mout, "a2", "b2"))
    minn = B(bil.minn, "m", "m")
    fmb = z(B(bil.fmb, "m", "m"))
    fmc = z(B(bil.fmc, "a2", "b2"))
    # exterior stem: dangles only within-strand
    w5 = jnp.where((I > 0) & (I != ct), B(bil.d5B, "m", "m"), 1.0)
    w3 = jnp.where((J < n - 1) & (J + 1 != ct), B(bil.d3B, "m", "m"), 1.0)
    fe = z(B(bil.tau, "a1", "b1") * w5 * w3)
    # exposed-cut closing stem (reversed orientation)
    x3 = jnp.where(I + 1 < ct, B(bil.d3r, "a2", "b1"), 1.0)
    x5 = jnp.where(J - 1 >= ct, B(bil.d5r, "a1", "b2"), 1.0)
    fcx = jnp.where(spanning, B(bil.taur, "a1", "b1") * x3 * x5 * sig ** 2,
                    0.0)

    return CoFactors(fhn=fhn, pstk=pstk, p11=p11, p21a=p21a, p21b=p21b,
                     p22=p22, pb15=pb15, pb13=pb13, tau=tau, taur=taur,
                     mout=mout, minn=minn, fmb=fmb, fmc=fmc, fe=fe, fcx=fcx)
