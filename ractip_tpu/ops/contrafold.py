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
D_HELIX = 30             # D_MAX_HELIX_LENGTH (reference Config.hpp:222)
NEG = -1e30


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def _shift_up(v, k):
    """out[i] = v[i+k] along axis 0, -inf fill."""
    k = min(k, v.shape[0])
    pad_shape = (k,) + v.shape[1:]
    return jnp.concatenate([v[k:], jnp.full(pad_shape, NEG, v.dtype)], axis=0)


def _shift_up0(v, k):
    """out[i] = v[i+k] along axis 0, zero fill (for additive perturbations)."""
    k = min(k, v.shape[0])
    pad_shape = (k,) + v.shape[1:]
    return jnp.concatenate([v[k:], jnp.zeros(pad_shape, v.dtype)], axis=0)


@partial(jax.jit, static_argnums=(3, 5, 7))
def _cf_logz(tables: CFTables, S: jnp.ndarray, n: jnp.ndarray, Lp: int,
             eps: jnp.ndarray, semiring: str = "sum",
             allow=None, emit_tables: bool = False,
             helix=None) -> jnp.ndarray:
    """log partition function of the CONTRAfold CRF; eps is an [Lp+1, Lp+1]
    perturbation added to every ScoreBasePair(a, b) (1-based).

    semiring="sum" computes log Z (inside algorithm); semiring="max" computes
    the Viterbi score (reference InferenceEngine.ipp:2519 ComputeViterbi --
    same recurrences in the max-plus semiring).  allow (optional [Lp, Lp]
    bool, 0-based) restricts the ensemble to structures whose pairs satisfy
    allow[i, j] -- the engine's constraint mask (reference
    InferenceEngine.ipp:1870 UseConstraints / allow_paired).

    helix (optional (length_at_least [D_HELIX+1], isolated scalar)) switches
    on the non-default PARAMS_HELIX_LENGTH / PARAMS_ISOLATED_BASE_PAIR
    feature groups (reference Config.hpp:136-137 "complex" profile): the FC
    recursion splits into FN (pair, next interaction not a stack), FE
    (stacking extension beyond length D) and a helix-rollout FC that scores
    each maximal helix with cumulative helix_length_at_least weights and
    length-1 helices with the isolated-base-pair weight (reference
    InferenceEngine.ipp:3414-3555 inside recursion, ScoreHelix :2203-2235,
    cache init :1127-1131).  With zero weights the decomposition spans the
    same ensemble as the default grammar, scores unchanged."""
    dtype = eps.dtype
    use_helix = helix is not None
    if use_helix:
        assert not emit_tables, "helix features: tables emission unsupported"
        hl_at_least, iso_score = helix
        # cache_score_helix_length[m] = sum_{t<=m} helix_length_at_least[t]
        hl = jnp.cumsum(jnp.asarray(hl_at_least, dtype))
        iso_score = jnp.asarray(iso_score, dtype)
    if semiring == "max":
        lse2 = jnp.maximum
        lsev = lambda x, axis=None: jnp.max(x, axis=axis)
    else:
        lse2 = jnp.logaddexp
        lsev = jax.nn.logsumexp
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
    if allow is not None:
        # allow is 0-based [Lp, Lp]; positions here are 1-based 0..Lp
        al = jnp.zeros((L1, L1), bool).at[1:, 1:].set(
            jnp.asarray(allow, bool)[: L1 - 1, : L1 - 1])
        pairable = pairable & (al | al.T)

    # unpaired-run prefix operator: R[i,k] = (k-i)*b for k >= i
    D = idx[None, :] - idx[:, None]
    R = jnp.where(D >= 0, D.astype(dtype) * b_mul, NEG)

    # eps padded with W leading columns for the window gather
    eps_pad = jnp.concatenate([jnp.zeros((L1, W), dtype), eps], axis=1)

    # static per-position junction pieces
    # JA(j, k) = closing[s_j, s_{k+1}] + dangle_l[s_j, s_{k+1}, s_{j+1}]
    #          + dangle_r[s_j, s_{k+1}, s_k]      (edge guards via N-zeros)
    # JB(i, j) = closing[s_i, s_{j+1}] + tm[s_i, s_{j+1}, s_{i+1}, s_j]

    # extended 1-based sequence for the helix-rollout row gathers s[i+t]
    sext = jnp.concatenate([s, jnp.zeros((D_HELIX,), S.dtype)])

    def column(carry, j):
        if use_helix:
            FCwin, FNwin, FEwin, FMmat, FMT, F5 = carry
        else:
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
        fm1 = lsev(R + fmh[None, :], axis=1)
        fm2 = lsev(FMmat + fmh[None, :], axis=1)
        bj = jnp.where(j <= n, b_mul, 0.0)
        FMT_new = lse2(fm2, FMT + bj)
        FMprev = jax.lax.dynamic_slice(
            FMmat, (0, jnp.maximum(j - 1, 0)), (L1, 1))[:, 0]
        FMprev = jnp.where(j >= 1, FMprev, NEG)
        fm = lse2(fm1, lse2(FMprev + bj, fm2))

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
        single = jb_ij + lsev(jnp.concatenate(terms, axis=1), axis=1)

        ja_ij = (tb.closing[s0, sjp1] + tb.dangle_l[s0, sjp1, sp1]
                 + tb.dangle_r[s0, sjp1, sj])
        multi = FMT_new + ja_ij + tb.multi_paired + tb.multi_base

        if not use_helix:
            fc = jnp.where(
                okFC,
                lse2(lse2(hairpin, stk), lse2(single, multi)),
                NEG)
        else:
            # ---- FN / FE / helix-rollout FC (reference ipp:3414-3555) ------
            # FN[i,j]: pair (i,j+1), next interaction NOT a stacking pair --
            # the default grammar minus the stack term (`single` already
            # excludes the l1=0,l2=0 case).
            fn = jnp.where(okFC, lse2(lse2(hairpin, single), multi), NEG)
            # FE[i,j] = BP(i+1,j)+HelixStacking(i,j+1)+FE[i+1,j-1]  (+)  FN
            fe_stk = jnp.where(okP & (idx + 2 <= j),
                               _shift_up(FEwin[:, 0], 1) + bp_col + stack_sc,
                               NEG)
            fe = jnp.where(okFC, lse2(fe_stk, fn), NEG)
            # FC[i,j] = Isolated + FN(i,j)
            #   (+) sum_{k=2}^{D-1} ScoreHelix(i-1,j+1,k) + FN(i+k-1,j-k+1)
            #   (+) ScoreHelix(i-1,j+1,D) + FE(i+D-1,j-D+1)
            # ScoreHelix(i-1,j+1,k) = hl[k] + sum_{t=1}^{k-1}
            #   HelixStacking(i+t-1,j-t+2) + BP(i+t,j-t+1)   (ipp:2203-2235)
            run = jnp.zeros((L1,), dtype)
            contribs = [iso_score + fn]
            for k in range(2, D_HELIX + 1):
                t = k - 1
                a_s = sext[idx + t]                     # s[i+t]
                a_sm1 = sext[idx + t - 1]               # s[i+t-1]
                q1 = jnp.clip(j - t + 1, 0, Lp + 1)     # partner j-t+1
                q2 = jnp.clip(j - t + 2, 0, Lp + 1)
                hs_t = tb.stack[a_sm1, s[q2], a_s, s[q1]]
                eps_t = _shift_up0(jax.lax.dynamic_slice(
                    eps_pad, (0, j - t + 1 + W), (L1, 1))[:, 0], t)
                bp_t = tb.bp[a_s, s[q1]] + eps_t
                ok_t = (pairable[jnp.clip(idx + t, 0, Lp),
                                 jnp.clip(j - t + 1, 0, Lp)]
                        & (idx + t <= Lp) & (j - t + 1 >= 1))
                run = run + jnp.where(ok_t, hs_t + bp_t, NEG)
                span_ok = idx + 2 * k - 2 <= j
                if k < D_HELIX:
                    inner = _shift_up(FNwin[:, k - 2], k - 1)
                else:
                    inner = _shift_up(FEwin[:, D_HELIX - 2], D_HELIX - 1)
                contribs.append(jnp.where(span_ok, run + hl[k] + inner, NEG))
            fc = jnp.where(okFC, lsev(jnp.stack(contribs, 0), axis=0), NEG)

        # ---- F5 --------------------------------------------------------------
        extcol = fmh - tb.multi_paired + tb.ext_paired
        F5prev = jnp.where(j >= 1, F5[jnp.maximum(j - 1, 0)], 0.0)
        f5j = lse2(F5prev + b_ext[jnp.minimum(j, Lp)],
                   lsev(F5 + extcol))
        F5 = F5.at[j].set(f5j)

        FCwin = jnp.concatenate([fc[:, None], FCwin[:, :-1]], axis=1)
        FMmat = jax.lax.dynamic_update_slice(FMmat, fm[:, None], (0, j))
        ys = (fc, FMT_new) if emit_tables else None
        if use_helix:
            FNwin = jnp.concatenate([fn[:, None], FNwin[:, :-1]], axis=1)
            FEwin = jnp.concatenate([fe[:, None], FEwin[:, :-1]], axis=1)
            return (FCwin, FNwin, FEwin, FMmat, FMT_new, F5), ys
        return (FCwin, FMmat, FMT_new, F5), ys

    FCwin0 = jnp.full((L1, W), NEG, dtype)
    FMmat0 = jnp.full((L1, L1), NEG, dtype)
    FMT0 = jnp.full((L1,), NEG, dtype)
    F50 = jnp.concatenate([jnp.zeros((1,), dtype),
                           jnp.full((Lp,), NEG, dtype)])
    if use_helix:
        carry0 = (FCwin0, jnp.full((L1, W), NEG, dtype),
                  jnp.full((L1, W), NEG, dtype), FMmat0, FMT0, F50)
        (_, _, _, FMmat, _, F5), ys = jax.lax.scan(
            column, carry0, jnp.arange(1, Lp + 1))
    else:
        (_, FMmat, _, F5), ys = jax.lax.scan(
            column, (FCwin0, FMmat0, FMT0, F50), jnp.arange(1, Lp + 1))
    if emit_tables:
        # FCstack[j-1] = fc column of step j (pairs (i, j+1));
        # FMTstack[j-1] = FMT column after step j
        return F5, ys[0], FMmat, ys[1]
    return F5[Lp]


def cf_helix_features(length_at_least=None, isolated=0.0):
    """Assemble the non-default PARAMS_HELIX_LENGTH / PARAMS_ISOLATED_BASE_PAIR
    feature weights (reference Config.hpp:136-137 "complex" profile,
    RegisterParameters ipp:555-580): length_at_least is the [D_HELIX+1]
    helix_length_at_least_i increment vector (index 0 unused by the grammar,
    kept for index parity with the reference cache), isolated the
    isolated_base_pair weight.  The shipped parameter files carry no trained
    values for these groups (the reference compiles them out), so weights are
    caller-supplied; zeros reproduce the default grammar exactly."""
    la = jnp.zeros((D_HELIX + 1,)) if length_at_least is None \
        else jnp.asarray(length_at_least)
    assert la.shape == (D_HELIX + 1,), la.shape
    return la, jnp.asarray(isolated)


def cf_logz(S, n, model: str = "complementary", dtype=jnp.float64,
            allow=None, helix=None):
    """log Z of the CONTRAfold ensemble for encoded sequence S (padded, [Lp]).

    allow (optional [Lp, Lp] bool) is the engine's constraint mask
    (reference InferenceEngine.ipp:1870 UseConstraints); helix (optional,
    from cf_helix_features) switches on the helix-length/isolated-pair
    feature groups."""
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((Lp + 1, Lp + 1), dtype)
    return _cf_logz(tables, jnp.asarray(S), jnp.asarray(n, jnp.int32), Lp,
                    eps, "sum", allow, False, helix)


def cf_base_pair_probs(S, n, model: str = "complementary",
                       dtype=jnp.float64, allow=None, helix=None) -> jnp.ndarray:
    """[Lp, Lp] posterior P(i pairs j) (0-based, upper+lower symmetric zeroed
    to upper triangle like the reference's triangular bp export).

    Posterior = d logZ / d eps where eps perturbs ScoreBasePair -- reverse-mode
    through the inside scan IS the outside algorithm (reference
    InferenceEngine.ipp:3731-4087 + :4498 hand-derive the same adjoint).
    With helix features on, eps also perturbs every rolled-out helix pair,
    so the adjoint covers the FN/FE/FC split too.
    """
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((Lp + 1, Lp + 1), dtype)
    g = jax.grad(lambda e: _cf_logz(tables, jnp.asarray(S),
                                    jnp.asarray(n, jnp.int32), Lp, e,
                                    "sum", allow, False, helix))(eps)
    return g[1:, 1:]


def cf_unpaired_probs(bpp: jnp.ndarray) -> jnp.ndarray:
    """up[i] = max(0, 1 - sum_j p(i,j)): the reference driver's accessibility
    proxy under the CONTRAfold engine (reference src/ractip.cpp:213-222)."""
    tot = jnp.sum(bpp, axis=0) + jnp.sum(bpp, axis=1)
    return jnp.maximum(0.0, 1.0 - tot)


# --------------------------------------------------------------------------
# decoding: Viterbi / MEA / stochastic traceback
# (the latent reference engine surface: InferenceEngine.ipp ComputeViterbi
# :2519 + PredictPairingsViterbi :3023, PredictPairingsPosterior MEA
# :4837-5010, PredictPairingsStochasticTraceback :5012-5256)
# --------------------------------------------------------------------------


def cf_viterbi(S, n, model: str = "complementary", dtype=jnp.float64,
               allow=None, helix=None):
    """(score, pairing) of the maximum-scoring structure.

    TPU-native traceback: the max-plus score is the zero-temperature logZ,
    and its gradient w.r.t. the ScoreBasePair perturbation eps is the
    indicator of the argmax structure's pairs (subgradient through max picks
    the winning monomial), so no backpointer storage is needed -- the
    reference's explicit traceback (InferenceEngine.ipp:3023) becomes one
    reverse-mode pass.  Returns (viterbi score, mapping [Lp] with partner
    index or -1, 0-based).
    """
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    # Deterministic position-dependent tie-breaking perturbation: on an exact
    # score tie the max-gradient splits mass across the tied optima and
    # 0.5-thresholding would drop pairs unique to each (yielding a mapping
    # that does not attain the returned score).  A generic tiny eps makes the
    # optimum unique, so the gradient is an exact 0/1 indicator of ONE
    # complete optimal structure (the reference's explicit traceback always
    # returns one, InferenceEngine.ipp:3023).  The perturbed score is
    # base + sum(eps over chosen pairs), subtracted back out below.
    tie = 1e-9 if dtype == jnp.float64 else 1e-5
    ia = jnp.arange(Lp + 1)
    eps = tie * (((ia[:, None] * 31 + ia[None, :] * 17) % 997) / 997.0)
    eps = eps.astype(dtype)
    score, g = jax.value_and_grad(
        lambda e: _cf_logz(tables, jnp.asarray(S), jnp.asarray(n, jnp.int32),
                           Lp, e, "max", allow, False, helix))(eps)
    ind = g[1:, 1:]                 # 0-based pair indicators, exact 0/1
    score = score - jnp.sum(jnp.where(ind > 0.5, eps[1:, 1:], 0.0))
    mapping = -jnp.ones((Lp,), jnp.int32)
    ii, jj = jnp.nonzero(ind > 0.5, size=Lp, fill_value=-1)
    ii, jj = ii.astype(jnp.int32), jj.astype(jnp.int32)
    mapping = mapping.at[jnp.where(ii >= 0, ii, Lp)].set(jj, mode="drop")
    mapping = mapping.at[jnp.where(jj >= 0, jj, Lp)].set(ii, mode="drop")
    return score, mapping


def cf_stochastic_traceback(S, n, num_samples: int = 1,
                            model: str = "complementary", seed: int = 0,
                            dtype=jnp.float64, allow=None):
    """Exact samples from the CRF structure distribution (reference
    InferenceEngine.ipp:5012 PredictPairingsStochasticTraceback).

    TPU-native split: the inside scan runs once on-device emitting the
    F5/FC/FM/FMT tables; the O(n^2)-per-sample recursive case-sampling then
    runs host-side in numpy over this module's last-helix decomposition
    (which spans the same ensemble as the reference's FM2 recursion).
    Returns a list of num_samples mappings ([n] partner index or -1,
    0-based)."""
    import numpy as np
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((Lp + 1, Lp + 1), dtype)
    F5, FCs, FM, FMTs = _cf_logz(tables, jnp.asarray(S),
                                 jnp.asarray(n, jnp.int32), Lp, eps, "sum",
                                 allow, True)
    F5 = np.asarray(F5)
    FCs = np.asarray(FCs)          # FCs[m-1][a] = FC for pair (a, m+1)
    FM = np.asarray(FM)            # FM[i][k]
    FMTs = np.asarray(FMTs)        # FMTs[j-1][k]
    n = int(n)

    tb = jax.tree.map(np.asarray, tables)
    s = np.zeros((Lp + 2,), np.int64)
    s[1:Lp + 1] = np.asarray(S)
    al = None
    if allow is not None:
        al = np.asarray(allow, bool)
        al = al | al.T
    idx = np.arange(Lp + 1)
    b_mul = float(tb.multi_unpaired)

    def b_ext(j):
        return float(tb.ext_unpaired) if 1 <= j <= n else 0.0

    def pairable(a, b):
        if not (1 <= a < b <= n and bool(tb.compl[s[a], s[b]])):
            return False
        return al is None or bool(al[a - 1, b - 1])

    def FCv(i, jp):
        return FCs[jp - 2][i] if jp >= 2 else NEG

    def fmh(j):
        """fmh_j[k]: last helix (k+1, j) of a multiloop segment."""
        out = np.full((Lp + 1,), NEG)
        for k in range(0, j - 1):
            if pairable(k + 1, j):
                inner = FCv(k + 1, j)
                ja = (tb.closing[s[j], s[k + 1]]
                      + tb.dangle_l[s[j], s[k + 1], s[j + 1]]
                      + tb.dangle_r[s[j], s[k + 1], s[k]])
                out[k] = inner + ja + tb.multi_paired + tb.bp[s[k + 1], s[j]]
        return out

    rng = np.random.default_rng(seed)

    def choose(logw, ref):
        w = np.exp(np.asarray(logw) - ref)
        w = np.where(np.isfinite(w), w, 0.0)
        t = w.sum()
        assert t > 0.5, (t, ref)
        return int(rng.choice(len(w), p=w / t))

    def sample_F5(j, pairs):
        while j > 0:
            fm_ = fmh(j)
            ext = fm_ - tb.multi_paired + tb.ext_paired
            logw = np.concatenate([[F5[j - 1] + b_ext(j)], F5 + ext])
            c = choose(logw, F5[j])
            if c == 0:
                j -= 1
                continue
            k = c - 1
            pairs.append((k + 1, j))
            sample_FC(k + 1, j, pairs)
            j = k

    def sample_FC(i, jp, pairs):
        m = jp - 1
        span = m - i
        cases, logw = [], []
        jb = (tb.closing[s[i], s[m + 1]]
              + tb.tm[s[i], s[m + 1], s[i + 1], s[m]])
        if span >= 3:
            cases.append(("hp",))
            logw.append(tb.hairpin_len[min(span, 30)] + jb)
        if pairable(i + 1, m) and i + 2 <= m:
            cases.append(("stk",))
            logw.append(FCv(i + 1, m) + tb.bp[s[i + 1], s[m]]
                        + tb.stack[s[i], s[m + 1], s[i + 1], s[m]])
        for l1 in range(W):
            a = i + l1 + 1
            if a > Lp:
                break
            for d in range(W):
                if d > MAXLOOP - l1 or (l1 == 0 and d == 0):
                    continue
                q = m - d
                if not (q >= 1 and a + 1 <= q and pairable(a, q)):
                    continue
                v = (FCv(a, q) + tb.bp[s[a], s[q]] + tb.closing[s[q], s[a]]
                     + tb.tm[s[q], s[a], s[q + 1], s[a - 1]]
                     + tb.single[l1][d] + jb)
                if l1 == 0 and d == 1:
                    v += tb.bulge0x1[s[m]]
                elif l1 == 1 and d == 0:
                    v += tb.bulge0x1[s[i + 1]]
                elif l1 == 1 and d == 1:
                    v += tb.int1x1[s[i + 1], s[m]]
                cases.append(("sng", a, q))
                logw.append(v)
        ja = (tb.closing[s[i], s[m + 1]]
              + tb.dangle_l[s[i], s[m + 1], s[i + 1]]
              + tb.dangle_r[s[i], s[m + 1], s[m]])
        cases.append(("mul",))
        logw.append(FMTs[m - 1][i] + ja + tb.multi_paired + tb.multi_base
                    if m >= 1 else NEG)
        c = cases[choose(logw, FCv(i, jp))]
        if c[0] == "stk":
            pairs.append((i + 1, m))
            sample_FC(i + 1, m, pairs)
        elif c[0] == "sng":
            pairs.append((c[1], c[2]))
            sample_FC(c[1], c[2], pairs)
        elif c[0] == "mul":
            sample_FMT(i, m, pairs)

    def last_helix(start_of, j, ref, pairs):
        """Split off the last helix (kk+1, j) of a >=2-branch segment."""
        fm_ = fmh(j)
        logw = start_of + fm_
        kk = choose(logw, ref)
        pairs.append((kk + 1, j))
        sample_FC(kk + 1, j, pairs)
        return kk

    def sample_FMT(k, j, pairs):
        while True:
            fm2 = _np_lse(FM[k] + fmh(j))
            prev = FMTs[j - 2][k] + (b_mul if j <= n else 0.0) \
                if j >= 2 else NEG
            c = choose([fm2, prev], FMTs[j - 1][k])
            if c == 1:
                j -= 1
                continue
            kk = last_helix(FM[k], j, fm2, pairs)
            sample_FM(k, kk, pairs)
            return

    def sample_FM(i, k, pairs):
        while True:
            fm_ = fmh(k)
            R = np.where(idx >= i, (idx - i) * b_mul, NEG)
            fm1 = _np_lse(R + fm_)
            fm2 = _np_lse(FM[i] + fm_)
            prev = FM[i][k - 1] + (b_mul if k <= n else 0.0) if k >= 1 else NEG
            c = choose([fm1, prev, fm2], FM[i][k])
            if c == 1:
                k -= 1
                continue
            if c == 0:
                kk = choose(R + fm_, fm1)
                pairs.append((kk + 1, k))
                sample_FC(kk + 1, k, pairs)
                return
            kk = last_helix(FM[i], k, fm2, pairs)
            k = kk

    out = []
    for _ in range(num_samples):
        pairs = []
        sample_F5(n, pairs)
        mp = -np.ones((n,), np.int64)
        for a, b in pairs:
            mp[a - 1], mp[b - 1] = b - 1, a - 1
        out.append(mp)
    return out


def _np_lse(v):
    import numpy as np
    m = np.max(v)
    if not np.isfinite(m):
        return NEG
    return float(m + np.log(np.exp(v - m).sum()))


def cf_mea(bpp, n: int, gamma: float = 6.0):
    """Maximum-expected-accuracy decode (reference
    InferenceEngine.ipp:4837-5010 PredictPairingsPosterior): maximize
    sum_unpaired q_i + 2*gamma * sum_pairs p_ij with q_i = 1 - sum_j p_ij
    via the Nussinov-style DP.  Host numpy (O(n^3) vectorized over the span
    diagonal); returns mapping [n] with partner index or -1 (0-based)."""
    import numpy as np
    p = np.asarray(bpp, np.float64)[:n, :n]
    p = p + p.T
    # unclamped, as the reference's unpaired posterior (tie-break parity;
    # accumulated float error can push q_i marginally below 0)
    q = 1.0 - p.sum(axis=1)
    M = np.full((n, n), 0.0)
    for i in range(n):
        M[i, i] = q[i]
    # pairscore[i, j] used when i pairs j
    ps = 2.0 * gamma * np.asarray(bpp, np.float64)[:n, :n]
    # choice recorded DURING the DP (as the reference's traceback does,
    # InferenceEngine.ipp:4917-4997) -- value-matching the cases afterwards
    # with a fixed tolerance can silently fail on long sequences:
    #   0 = i unpaired, 1 = j unpaired, 2 = (i,j) paired,
    #   3+off = bifurcation at k = i + off
    C = np.zeros((n, n), np.int64)
    for s in range(1, n):
        i = np.arange(0, n - s)
        j = i + s
        cand = np.empty((3 + s, n - s))
        cand[0] = M[i + 1, j] + q[i]
        cand[1] = M[i, j - 1] + q[j]
        pair = ps[i, j].copy()
        if s >= 2:
            pair += M[i + 1, j - 1]
        cand[2] = pair
        for off in range(s):
            k = i + off
            cand[3 + off] = M[i, k] + M[k + 1, j]
        am = np.argmax(cand, axis=0)
        M[i, j] = cand[am, np.arange(n - s)]
        C[i, j] = am
    # exact traceback over the recorded choices
    mapping = -np.ones((n,), np.int64)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if i >= j:
            continue
        c = C[i, j]
        if c == 0:
            stack.append((i + 1, j))
        elif c == 1:
            stack.append((i, j - 1))
        elif c == 2:
            mapping[i], mapping[j] = j, i
            stack.append((i + 1, j - 1))
        else:
            k = i + int(c - 3)
            stack.append((i, k))
            stack.append((k + 1, j))
    return mapping


# --------------------------------------------------------------------------
# UseLoss: max-margin (loss-augmented) inference surface
# (reference InferenceEngine::UseLoss, InferenceEngine.ipp:1824 -- the
# training-side API of CONTRAfold's max-margin mode.  The reference adds
# per-position FP/FN loss scores to the scoring cache before Viterbi; here
# the Hamming-style pair loss decomposes exactly onto the existing
# ScoreBasePair perturbation eps:
#     loss(y; y*) = sum_{ij in y} [fp*(ij not in y*) - fn*(ij in y*)]
#                   + fn*|y*|                         (a constant)
# so loss-augmented inference is one cf_viterbi/cf_logz call with
# eps = loss matrix, plus the constant.)
# --------------------------------------------------------------------------


def cf_loss_matrix(mapping_true, Lp: int, fp: float = 1.0, fn: float = 1.0,
                   dtype=jnp.float64):
    """(eps [Lp+1, Lp+1] 1-based, const): pair-decomposed Hamming loss
    against the true 0-based mapping (partner index or -1)."""
    import numpy as np
    eps = np.full((Lp + 1, Lp + 1), fp, np.float64)
    npairs = 0
    mt = np.asarray(mapping_true)
    for i, m in enumerate(mt):
        if m >= 0 and i < m:
            eps[i + 1, m + 1] = -fn
            npairs += 1
    return jnp.asarray(eps, dtype), fn * npairs


def cf_loss_augmented_viterbi(S, n, mapping_true, fp: float = 1.0,
                              fn: float = 1.0, model: str = "complementary",
                              dtype=jnp.float64, allow=None):
    """argmax_y [score(y) + loss(y; y_true)] -- the separation oracle of
    max-margin training (reference UseLoss + ComputeViterbi).

    Returns (augmented_score, score, mapping): the loss-augmented optimum,
    the UNAUGMENTED score of that structure, and its mapping."""
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    eps, const = cf_loss_matrix(mapping_true, Lp, fp, fn, dtype)
    # deterministic tie-break on top of the loss perturbation (see
    # cf_viterbi): keeps the gradient an exact 0/1 indicator
    tie = 1e-9 if dtype == jnp.float64 else 1e-5
    ia = jnp.arange(Lp + 1)
    eps = eps + (tie * (((ia[:, None] * 31 + ia[None, :] * 17) % 997)
                        / 997.0)).astype(dtype)
    score_p, g = jax.value_and_grad(
        lambda e: _cf_logz(tables, jnp.asarray(S), jnp.asarray(n, jnp.int32),
                           Lp, e, "max", allow))(eps)
    ind = g[1:, 1:]
    chosen_eps = jnp.sum(jnp.where(ind > 0.5, eps[1:, 1:], 0.0))
    aug = score_p - chosen_eps + jnp.sum(
        jnp.where(ind > 0.5,
                  jnp.where(eps[1:, 1:] < 0, -fn, fp), 0.0)) + const
    score = score_p - chosen_eps
    mapping = -jnp.ones((Lp,), jnp.int32)
    ii, jj = jnp.nonzero(ind > 0.5, size=Lp, fill_value=-1)
    ii, jj = ii.astype(jnp.int32), jj.astype(jnp.int32)
    mapping = mapping.at[jnp.where(ii >= 0, ii, Lp)].set(jj, mode="drop")
    mapping = mapping.at[jnp.where(jj >= 0, jj, Lp)].set(ii, mode="drop")
    return aug, score, mapping


def cf_margin(S, n, mapping_true, fp: float = 1.0, fn: float = 1.0,
              model: str = "complementary", dtype=jnp.float64, allow=None):
    """Structured hinge loss max(0, max_y[score(y)+loss(y)] - score(y*)) --
    the per-example objective of CONTRAfold's max-margin training mode
    (reference Config USE_LOSS + InferenceEngine.ipp:1824)."""
    Lp = S.shape[0]
    tables = get_cf_tables(model)
    # score(y*): constrained max with only the true pairs allowed AND each
    # forced via a large eps bonus (subtracted back) -- the allow-mask alone
    # would let the max DROP an unfavorable true pair.
    import numpy as np
    mt = np.asarray(mapping_true)
    allow_true = np.zeros((Lp, Lp), bool)
    M = 1e4
    eps_force = np.zeros((Lp + 1, Lp + 1))
    npairs = 0
    for i, m in enumerate(mt):
        if m >= 0:
            allow_true[i, m] = True
            if i < m:
                eps_force[i + 1, m + 1] = M
                npairs += 1
    s_true = _cf_logz(tables, jnp.asarray(S), jnp.asarray(n, jnp.int32), Lp,
                      jnp.asarray(eps_force, dtype), "max",
                      jnp.asarray(allow_true)) - M * npairs
    aug, _, _ = cf_loss_augmented_viterbi(S, n, mapping_true, fp, fn, model,
                                          dtype, allow)
    return jnp.maximum(aug - s_true, 0.0)
