"""CONTRAfold learned-CRF single-sequence inference engine (TPU-native).

Equivalent of the reference's vendored CONTRAfold InferenceEngine inside /
outside / posterior path (reference src/contrafold/InferenceEngine.ipp:
ComputeInside :3356-3722, ComputeOutside :3731-4087, ComputePosterior :4498,
driver usage src/ractip.cpp:195-222) for the shipped feature configuration
(Config.hpp:173-196: no helix-length / isolated-pair features, so the DP is
over F5/FC/FM/FM1 only) with the default complementary learned weights.

TPU-first design differences from the reference:

* Column scan (lax.scan over j) in log space instead of the row-major
  triangular fill; the 31x31 single-branch-loop window reads a rolling
  31-column FC buffer, mirroring the banded-window design of ops.mccaskill.
* The multibranch table FM is re-factorized so each column is a closed-form
  function of *previous* columns: CONTRAfold's FM2[i,j] = sum_k FM1[i,k] +
  FM[k,j] recursion makes FM[.,j] depend on itself within the column, so we
  split on the LAST helix instead:  with FMH[k,j] = FC[k+1,j-1] +
  JunctionA(j,k) + c + BasePair(k+1,j) (a helix ending exactly at j),
      FM1[.,j] = R @ FMH[.,j]        (R = unpaired-run prefix operator)
      FM2[i,j] = logsum_k FM[i,k] + FMH[k,j]
      FM[.,j]  = FM1 (+) FM[.,j-1]+b (+) FM2
      FMT[.,j] = FM2 (+) FMT[.,j-1]+b   (>=2 helices; == CONTRAfold's FM2 term
                                         as consumed by FC's multi case)
  Both factorizations decompose the same structure ensemble, so all scores
  and marginals are identical.
* The outside pass is not hand-derived: every ScoreBasePair(a,b) carries a
  perturbation eps[a,b], and posterior pair probabilities are exactly
  d logZ / d eps via jax.grad through the scan (reverse-mode = outside).

Positions are 1-based as in the reference; padded tail positions encode 0
("N"), whose score-table entries are all zero, which reproduces the
reference's sequence-edge guards automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import MAXLOOP
from ..params.contrafold import CFTables, get_cf_tables

W = MAXLOOP + 1          # single-branch loop window (l1, l2 in 0..30)
NEG = -1e30


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def _shift_up(v, k):
    """out[i] = v[i+k] along axis 0, -inf fill."""
    k = min(k, v.shape[0])
    pad_shape = (k,) + v.shape[1:]
    return jnp.concatenate([v[k:], jnp.full(pad_shape, NEG, v.dtype)], axis=0)


@partial(jax.jit, static_argnums=(3,))
def _cf_logz(tables: CFTables, S: jnp.ndarray, n: jnp.ndarray, Lp: int,
             eps: jnp.ndarray) -> jnp.ndarray:
    """log partition function of the CONTRAfold CRF; eps is an [Lp+1, Lp+1]
    perturbation added to every ScoreBasePair(a, b) (1-based)."""
    dtype = eps.dtype
    tb = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a, tables)
    # 1-based sequence with sentinel 0 at both ends; 31 leading pads so q = j-d
    # gathers never go negative.
    s = jnp.concatenate([jnp.zeros((1,), S.dtype), S,
                         jnp.zeros((1,), S.dtype)])        # [Lp+2], s[1..Lp]
    spad = jnp.concatenate([jnp.zeros((W,), S.dtype), s])  # index +W
    L1 = Lp + 1
    idx = jnp.arange(L1)                                   # 0..Lp (positions)
    s0 = s[:L1]                                            # s[k]
    sp1 = s[1:L1 + 1]                                      # s[k+1]
    sm1 = jnp.concatenate([jnp.zeros((1,), S.dtype), s[:L1 - 1]])  # s[k-1]

    b_mul = tb.multi_unpaired
    b_ext = jnp.where((idx >= 1) & (idx <= n), tb.ext_unpaired, 0.0)

    # complementarity + bounds: pair (a, b) allowed iff 1 <= a < b <= n and
    # the letters are complementary (reference InferenceEngine.ipp:1083-1096)
    pairable = tb.compl[s0[:, None], s0[None, :]] \
        & (idx[:, None] >= 1) & (idx[None, :] <= n) \
        & (idx[:, None] < idx[None, :])

    # unpaired-run prefix operator: R[i,k] = (k-i)*b for k >= i
    D = idx[None, :] - idx[:, None]
    R = jnp.where(D >= 0, D.astype(dtype) * b_mul, NEG)

    # eps padded with W leading columns for the window gather
    eps_pad = jnp.concatenate([jnp.zeros((L1, W), dtype), eps], axis=1)

    # static per-position junction pieces
    # JA(j, k) = closing[s_j, s_{k+1}] + dangle_l[s_j, s_{k+1}, s_{j+1}]
    #          + dangle_r[s_j, s_{k+1}, s_k]      (edge guards via N-zeros)
    # JB(i, j) = closing[s_i, s_{j+1}] + tm[s_i, s_{j+1}, s_{i+1}, s_j]

    def column(carry, j):
        FCwin, FMmat, FMT, F5 = carry
        # FCwin[:, d] = FC[:, j-1-d]; FMmat[:, k] = FM[:, k] for k < j
        sj = s[j]
        sjp1 = s[j + 1]

        # ---- FMH / external-pair column ------------------------------------
        ja_col = (tb.closing[sj, sp1] + tb.dangle_l[sj, sp1, sjp1]
                  + tb.dangle_r[sj, sp1, s0])
        # bp_col[k] = BasePair(k+1, j) + eps[k+1, j]
        epscol = jax.lax.dynamic_slice(eps_pad, (0, j + W), (L1, 1))[:, 0]
        bp_col = tb.bp[sp1, sj] + jnp.concatenate(
            [epscol[1:], jnp.zeros((1,), dtype)])
        okP = pairable[jnp.minimum(idx + 1, Lp), j] & (idx + 1 <= Lp)
        FCprev = FCwin[:, 0]
        fmh = jnp.where(okP & (idx <= j - 2),
                        _shift_up(FCprev, 1) + ja_col + tb.multi_paired
                        + bp_col, NEG)

        # ---- FM1 / FM2 / FMT / FM ------------------------------------------
        fm1 = jax.nn.logsumexp(R + fmh[None, :], axis=1)
        fm2 = jax.nn.logsumexp(FMmat + fmh[None, :], axis=1)
        bj = jnp.where(j <= n, b_mul, 0.0)
        FMT_new = _logaddexp(fm2, FMT + bj)
        FMprev = jax.lax.dynamic_slice(
            FMmat, (0, jnp.maximum(j - 1, 0)), (L1, 1))[:, 0]
        FMprev = jnp.where(j >= 1, FMprev, NEG)
        fm = _logaddexp(fm1, _logaddexp(FMprev + bj, fm2))

        # ---- FC column: pair (i, j+1) --------------------------------------
        jb_ij = tb.closing[s0, sjp1] + tb.tm[s0, sjp1, sp1, sj]
        okFC = pairable[idx, jnp.minimum(j + 1, Lp)] & (j + 1 <= Lp)

        span = j - idx
        hairpin = jnp.where(span >= 3,
                            tb.hairpin_len[jnp.clip(span, 0, 30)] + jb_ij, NEG)

        stack_sc = tb.stack[s0, sjp1, sp1, sj]
        stk = jnp.where(okP & (idx + 2 <= j),
                        _shift_up(FCprev, 1) + bp_col + stack_sc, NEG)

        # generic single-branch loops: inner pair (a, q), a = i+l1+1, q = j-d
        dvec = jnp.arange(W)
        qpos = j - dvec                                     # [W]
        s_q = spad[qpos + W]
        s_qp1 = spad[qpos + 1 + W]
        # Acoef[a, d] = BP(a, q) + eps[a, q] + JB(q, a-1)
        eps_win = jax.lax.dynamic_slice(
            eps_pad, (0, j + W - (W - 1)), (L1, W))[:, ::-1]   # [:, d] = eps[:, j-d]
        okA = pairable[:, jnp.clip(qpos, 0, Lp)] & (qpos >= 1) \
            & (idx[:, None] + 1 <= qpos[None, :])           # a + 1 <= q
        acoef = jnp.where(
            okA,
            tb.bp[s0[:, None], s_q[None, :]] + eps_win
            + tb.closing[s_q, s0[:, None]]
            + tb.tm[s_q[None, :], s0[:, None], s_qp1[None, :], sm1[:, None]],
            NEG)
        Xw = FCwin + acoef                                  # FC[a, q-1] + Acoef

        # nucleotide specials folded per (l1, d):
        b0x1 = tb.bulge0x1[sj]                              # l1=0, d=1 (scalar)
        b1x0 = tb.bulge0x1[sp1]                             # l1=1, d=0 (vec over i)
        i1x1 = tb.int1x1[sp1, sj]                           # l1=1, d=1 (vec over i)

        terms = []
        for l1 in range(W):
            y = _shift_up(Xw, l1 + 1)                       # rows a = i+l1+1
            cs = tb.single[l1]                              # [W] over d
            dmask = (dvec <= MAXLOOP - l1) & ~((l1 == 0) & (dvec == 0))
            y = jnp.where(dmask[None, :], y + cs[None, :], NEG)
            if l1 == 0:
                y = y.at[:, 1].add(b0x1)
            elif l1 == 1:
                y = y.at[:, 0].add(b1x0)
                y = y.at[:, 1].add(i1x1)
            terms.append(y)
        single = jb_ij + jax.nn.logsumexp(
            jnp.concatenate(terms, axis=1), axis=1)

        ja_ij = (tb.closing[s0, sjp1] + tb.dangle_l[s0, sjp1, sp1]
                 + tb.dangle_r[s0, sjp1, sj])
        multi = FMT_new + ja_ij + tb.multi_paired + tb.multi_base

        fc = jnp.where(
            okFC,
            _logaddexp(_logaddexp(hairpin, stk), _logaddexp(single, multi)),
            NEG)

        # ---- F5 --------------------------------------------------------------
        extcol = fmh - tb.multi_paired + tb.ext_paired
        F5prev = jnp.where(j >= 1, F5[jnp.maximum(j - 1, 0)], 0.0)
        f5j = _logaddexp(F5prev + b_ext[jnp.minimum(j, Lp)],
                         jax.nn.logsumexp(F5 + extcol))
        F5 = F5.at[j].set(f5j)

        FCwin = jnp.concatenate([fc[:, None], FCwin[:, :-1]], axis=1)
        FMmat = jax.lax.dynamic_update_slice(FMmat, fm[:, None], (0, j))
        return (FCwin, FMmat, FMT_new, F5), None

    FCwin0 = jnp.full((L1, W), NEG, dtype)
    FMmat0 = jnp.full((L1, L1), NEG, dtype)
    FMT0 = jnp.full((L1,), NEG, dtype)
    F50 = jnp.concatenate([jnp.zeros((1,), dtype),
                           jnp.full((Lp,), NEG, dtype)])
    (_, _, _, F5), _ = jax.lax.scan(
        column, (FCwin0, FMmat0, FMT0, F50), jnp.arange(1, Lp + 1))
    return F5[Lp]


def cf_logz(S, n, model: str = "complementary", dtype=jnp.float64):
    """log Z of the CONTRAfold ensemble for encoded sequence S (padded, [Lp])."""
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((Lp + 1, Lp + 1), dtype)
    return _cf_logz(tables, jnp.asarray(S), jnp.asarray(n, jnp.int32), Lp, eps)


def cf_base_pair_probs(S, n, model: str = "complementary",
                       dtype=jnp.float64) -> jnp.ndarray:
    """[Lp, Lp] posterior P(i pairs j) (0-based, upper+lower symmetric zeroed
    to upper triangle like the reference's triangular bp export).

    Posterior = d logZ / d eps where eps perturbs ScoreBasePair -- reverse-mode
    through the inside scan IS the outside algorithm (reference
    InferenceEngine.ipp:3731-4087 + :4498 hand-derive the same adjoint).
    """
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((Lp + 1, Lp + 1), dtype)
    g = jax.grad(lambda e: _cf_logz(tables, jnp.asarray(S),
                                    jnp.asarray(n, jnp.int32), Lp, e))(eps)
    return g[1:, 1:]


def cf_unpaired_probs(bpp: jnp.ndarray) -> jnp.ndarray:
    """up[i] = max(0, 1 - sum_j p(i,j)): the reference driver's accessibility
    proxy under the CONTRAfold engine (reference src/ractip.cpp:213-222)."""
    tot = jnp.sum(bpp, axis=0) + jnp.sum(bpp, axis=1)
    return jnp.maximum(0.0, 1.0 - tot)
