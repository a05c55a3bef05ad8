"""CONTRAfold CRF engine vs structure-enumeration oracle.

The oracle enumerates every secondary structure (non-crossing complementary
pairs, hairpin >= 3 unpaired) of short sequences and scores each with an
independent recursive implementation of the reference's feature sum
(reference src/contrafold/InferenceEngine.ipp Score* helpers: ScoreHairpin
:2123, ScoreSingle :2460, ScoreJunctionA :1927, ScoreJunctionB :2004,
multi/external scalars :55-205).  logZ and posterior pair marginals from the
scan-based engine must match enumeration exactly (f64).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.ops.contrafold import (cf_base_pair_probs, cf_logz,
                                       cf_unpaired_probs)
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.contrafold import get_cf_tables
from ractip_tpu.params.contrafold_data import COMPLEMENTARY

COMPL = {"AU", "UA", "GU", "UG", "CG", "GC"}


def enum_structures(seq: str):
    """All sets of non-crossing complementary pairs with span >= 4 (1-based)."""
    n = len(seq)

    def pairable(a, b):
        return seq[a - 1] + seq[b - 1] in COMPL and b - a >= 4

    def gen(lo, hi):
        if lo > hi:
            yield []
            return
        # position lo unpaired
        for rest in gen(lo + 1, hi):
            yield rest
        # position lo paired with b
        for b in range(lo + 4, hi + 1):
            if pairable(lo, b):
                for inner in gen(lo + 1, b - 1):
                    for outer in gen(b + 1, hi):
                        yield [(lo, b)] + inner + outer

    return list(gen(1, n))


def np_tables():
    tb = get_cf_tables()
    return {k: np.asarray(v) for k, v in tb._asdict().items()}


def score_structure(tb, seq: str, pairs):
    """Independent recursive scorer following the reference grammar."""
    n = len(seq)
    s = np.concatenate([[0], encode(seq), [0]])  # 1-based + sentinels

    def JA(x, y):
        # JunctionA(x, y): closing pair letters (x, y+1)
        v = tb["closing"][s[x], s[y + 1]]
        if x < n:
            v += tb["dangle_l"][s[x], s[y + 1], s[x + 1]]
        if y > 0:
            v += tb["dangle_r"][s[x], s[y + 1], s[y]]
        return v

    def JB(x, y):
        return tb["closing"][s[x], s[y + 1]] + tb["tm"][s[x], s[y + 1],
                                                        s[x + 1], s[y]]

    def children_of(pairs, lo, hi):
        tops, inside = [], set()
        for (a, b) in sorted(pairs):
            if lo <= a and b <= hi and a not in inside:
                tops.append((a, b))
                inside.update(range(a, b + 1))
        return tops

    def rec(a, b, sub):
        kids = children_of(sub, a + 1, b - 1)
        inner = [p for p in sub if p not in kids and a < p[0] < b]
        v = 0.0
        if not kids:
            assert not inner
            return JB(a, b - 1) + tb["hairpin_len"][min(b - 1 - a, 30)]
        if len(kids) == 1:
            (c, d) = kids[0]
            l1, l2 = c - a - 1, b - d - 1
            if l1 == 0 and l2 == 0:
                v = tb["bp"][s[c], s[d]] + tb["stack"][s[a], s[b], s[c], s[d]]
            else:
                if l1 + l2 > 30:
                    return None
                v = (tb["single"][l1, l2] + tb["bp"][s[c], s[d]]
                     + JB(a, b - 1) + JB(d, c - 1))
                if l1 == 0 and l2 == 1:
                    v += tb["bulge0x1"][s[b - 1]]
                if l1 == 1 and l2 == 0:
                    v += tb["bulge0x1"][s[a + 1]]
                if l1 == 1 and l2 == 1:
                    v += tb["int1x1"][s[a + 1], s[b - 1]]
            r = rec(c, d, [p for p in sub if c <= p[0] and p[1] <= d
                           and p != (c, d)])
            return None if r is None else v + r
        # multibranch
        v = (JA(a, b - 1) + tb["multi_paired"] + tb["multi_base"])
        covered = set()
        for (c, d) in kids:
            v += (tb["multi_paired"] + tb["bp"][s[c], s[d]] + JA(d, c - 1))
            r = rec(c, d, [p for p in sub if c <= p[0] and p[1] <= d
                           and p != (c, d)])
            if r is None:
                return None
            v += r
            covered.update(range(c, d + 1))
        v += tb["multi_unpaired"] * sum(
            1 for m in range(a + 1, b) if m not in covered)
        return v

    tops = children_of(pairs, 1, n)
    covered = set()
    v = 0.0
    for (a, b) in tops:
        v += tb["ext_paired"] + tb["bp"][s[a], s[b]] + JA(b, a - 1)
        r = rec(a, b, [p for p in pairs if a <= p[0] and p[1] <= b
                       and p != (a, b)])
        if r is None:
            return None
        v += r
        covered.update(range(a, b + 1))
    v += tb["ext_unpaired"] * sum(1 for m in range(1, n + 1)
                                  if m not in covered)
    return v


def oracle(seq: str):
    tb = np_tables()
    n = len(seq)
    scores, plist = [], []
    for pairs in enum_structures(seq):
        sc = score_structure(tb, seq, pairs)
        if sc is not None:
            scores.append(sc)
            plist.append(pairs)
    scores = np.array(scores)
    m = scores.max()
    w = np.exp(scores - m)
    z = w.sum()
    logz = np.log(z) + m
    bpp = np.zeros((n, n))
    for wk, pairs in zip(w, plist):
        for (a, b) in pairs:
            bpp[a - 1, b - 1] += wk / z
    return logz, bpp


SEQS = ["GCGAAACGC", "GGCGAAAACGUCC", "ACGUACGUACGU", "GGGGAAAACCCC"]


@pytest.mark.parametrize("seq", SEQS)
def test_cf_logz_and_bpp_vs_enumeration(seq):
    logz_o, bpp_o = oracle(seq)
    n = len(seq)
    Lp = n + 3  # exercise padding
    S = encode(seq, Lp)
    logz = float(cf_logz(S, n))
    assert logz == pytest.approx(logz_o, abs=1e-8), seq
    bpp = np.asarray(cf_base_pair_probs(S, n))
    np.testing.assert_allclose(bpp[:n, :n], bpp_o, atol=1e-9)
    # nothing outside the sequence
    assert np.all(bpp[n:, :] == 0) and np.all(bpp[:, n:] == 0)
    up = np.asarray(cf_unpaired_probs(bpp))
    assert np.all(up >= 0) and np.all(up <= 1 + 1e-9)


def test_cf_tables_spot_values():
    tb = get_cf_tables()
    # base_pair_AU (Defaults.ipp:21), my encoding A=1, U=4; symmetric
    assert float(tb.bp[1, 4]) == pytest.approx(COMPLEMENTARY["base_pair_AU"])
    assert float(tb.bp[4, 1]) == pytest.approx(COMPLEMENTARY["base_pair_AU"])
    assert float(tb.multi_base) == pytest.approx(COMPLEMENTARY["multi_base"])
    # cumulative hairpin cache: value at 3 = sum of at_least_0..3
    want = sum(COMPLEMENTARY.get(f"hairpin_length_at_least_{k}", 0.0)
               for k in range(4))
    assert float(tb.hairpin_len[3]) == pytest.approx(want)
    # N rows are all zero
    assert np.all(np.asarray(tb.bp)[0] == 0)
    assert np.all(np.asarray(tb.tm)[0] == 0)


def test_cf_padding_invariance():
    seq = "GCGAAACGC"
    a = float(cf_logz(encode(seq, 12), len(seq)))
    b = float(cf_logz(encode(seq, 20), len(seq)))
    assert a == pytest.approx(b, abs=1e-9)


@pytest.mark.parametrize("seq", SEQS)
def test_cf_viterbi_vs_enumeration(seq):
    """Max-semiring scan + gradient traceback == brute-force argmax
    (reference InferenceEngine.ipp:2519 ComputeViterbi, :3023 traceback)."""
    from ractip_tpu.ops.contrafold import cf_viterbi
    tb = np_tables()
    n = len(seq)
    best = max(score_structure(tb, seq, pairs)
               for pairs in enum_structures(seq)
               if score_structure(tb, seq, pairs) is not None)
    S = encode(seq, n + 3)
    score, mapping = cf_viterbi(S, n)
    assert float(score) == pytest.approx(best, abs=1e-8), seq
    # decoded structure is well-formed, scores exactly the optimum
    mp = np.asarray(mapping)
    pairs = sorted((i + 1, int(mp[i]) + 1) for i in range(n)
                   if 0 <= mp[i] and i < mp[i])
    for i, m in enumerate(mp[:n]):
        if m >= 0:
            assert mp[m] == i
    sc = score_structure(tb, seq, pairs)
    assert sc is not None and sc == pytest.approx(best, abs=1e-8)


def test_cf_viterbi_constraints():
    """allow mask (UseConstraints equivalent) excludes banned pairs from both
    Viterbi and the posterior ensemble."""
    from ractip_tpu.ops.contrafold import cf_viterbi
    seq = "GGGGAAAACCCC"
    n = len(seq)
    S = encode(seq, n)
    _, mp0 = cf_viterbi(S, n)
    mp0 = np.asarray(mp0)
    # ban every pair used by the unconstrained optimum
    allow = np.ones((n, n), bool)
    for i in range(n):
        if mp0[i] >= 0 and i < mp0[i]:
            allow[i, mp0[i]] = allow[mp0[i], i] = False
    sc1, mp1 = cf_viterbi(S, n, allow=jnp.asarray(allow))
    mp1 = np.asarray(mp1)
    for i in range(n):
        if mp1[i] >= 0 and i < mp1[i]:
            assert allow[i, mp1[i]]
    # constrained logZ < unconstrained logZ
    lz0 = float(cf_logz(S, n))
    lz1 = float(cf_logz(S, n, allow=jnp.asarray(allow)))
    assert lz1 < lz0
    # oracle check: constrained logZ == enumeration over allowed structures
    tb = np_tables()
    scores = [score_structure(tb, seq, pairs)
              for pairs in enum_structures(seq)
              if all(allow[a - 1, b - 1] for a, b in pairs)]
    scores = np.array([s for s in scores if s is not None])
    m = scores.max()
    assert lz1 == pytest.approx(float(np.log(np.exp(scores - m).sum()) + m),
                                abs=1e-8)


@pytest.mark.parametrize("seq", SEQS[:2])
def test_cf_mea_vs_bruteforce(seq):
    """MEA decode maximizes the expected-accuracy objective over structures
    (reference InferenceEngine.ipp:4837 PredictPairingsPosterior)."""
    from ractip_tpu.ops.contrafold import cf_mea
    n = len(seq)
    gamma = 6.0
    S = encode(seq, n)
    bpp = np.asarray(cf_base_pair_probs(S, n))
    p = bpp + bpp.T
    q = np.maximum(0.0, 1.0 - p.sum(axis=1))

    def obj(pairs):
        used = set()
        v = 0.0
        for a, b in pairs:
            v += 2.0 * gamma * bpp[a - 1, b - 1]
            used.update((a - 1, b - 1))
        v += sum(q[i] for i in range(n) if i not in used)
        return v

    best = max(obj(pairs) for pairs in enum_structures(seq))
    mp = cf_mea(bpp, n, gamma)
    pairs = sorted((i + 1, int(mp[i]) + 1) for i in range(n)
                   if 0 <= mp[i] and i < mp[i])
    got = obj(pairs)
    # MEA's DP searches ALL non-crossing pairings (not only complementary
    # enumerated ones), so its optimum can only be >= the enumerated best
    assert got >= best - 1e-9


def test_cf_stochastic_traceback_matches_posterior():
    """Empirical pair frequencies from exact CRF samples converge to the
    posterior bpp (reference InferenceEngine.ipp:5012)."""
    from ractip_tpu.ops.contrafold import cf_stochastic_traceback
    seq = "GGCGAAAACGUCC"
    n = len(seq)
    S = encode(seq, n)
    bpp = np.asarray(cf_base_pair_probs(S, n))
    N = 3000
    samples = cf_stochastic_traceback(S, n, num_samples=N, seed=42)
    freq = np.zeros((n, n))
    for mp in samples:
        for i in range(n):
            if mp[i] >= 0 and i < mp[i]:
                freq[i, mp[i]] += 1.0 / N
        # sampled structures are well-formed
        for i in range(n):
            if mp[i] >= 0:
                assert mp[mp[i]] == i
    # 3-sigma binomial tolerance at p~0.5 / N=3000 is ~0.027
    assert np.abs(freq - bpp[:n, :n]).max() < 0.04


def test_cf_loss_augmented_viterbi():
    """UseLoss surface (reference InferenceEngine.ipp:1824): the
    loss-augmented optimum equals the brute-force max of score + Hamming
    pair loss, and the hinge margin is >= the loss of the Viterbi optimum."""
    from ractip_tpu.ops.contrafold import (cf_loss_augmented_viterbi,
                                           cf_margin, cf_viterbi)
    seq = "GGGAAACCCAA"
    n = len(seq)
    S = encode(seq, n)
    tb = np_tables()
    # pick a "true" structure: the Viterbi optimum of a shifted sequence --
    # just use one enumerated structure with a pair
    y_true = next(p for p in enum_structures(seq) if len(p) == 1)
    mt = -np.ones(n, np.int64)
    for a, b in y_true:
        mt[a - 1], mt[b - 1] = b - 1, a - 1
    fp = fn = 0.7

    def loss(pairs):
        yt = set(y_true)
        return (fp * sum(1 for p in pairs if p not in yt)
                + fn * sum(1 for p in yt if p not in pairs))

    best = max(score_structure(tb, seq, pairs) + loss(pairs)
               for pairs in enum_structures(seq)
               if score_structure(tb, seq, pairs) is not None)
    aug, score, mp = cf_loss_augmented_viterbi(S, n, mt, fp=fp, fn=fn)
    assert float(aug) == pytest.approx(best, abs=1e-6)
    mp = np.asarray(mp)
    pairs = sorted((i + 1, int(mp[i]) + 1) for i in range(n)
                   if 0 <= mp[i] and i < mp[i])
    sc = score_structure(tb, seq, pairs)
    assert sc == pytest.approx(float(score), abs=1e-6)
    assert float(aug) == pytest.approx(sc + loss(pairs), abs=1e-6)
    # hinge margin: aug - score(y_true), clamped at 0
    s_true = score_structure(tb, seq, y_true)
    m = cf_margin(S, n, mt, fp=fp, fn=fn)
    assert float(m) == pytest.approx(max(0.0, best - s_true), abs=1e-6)


# --------------------------------------------------------------------------
# non-default feature groups: PARAMS_HELIX_LENGTH / PARAMS_ISOLATED_BASE_PAIR
# (reference Config.hpp:136-137 "complex" profile; FN/FE/FC rollout
# recursion InferenceEngine.ipp:3414-3555, ScoreHelix :2203-2235)
# --------------------------------------------------------------------------


def helix_extra(pairs, hl_at_least, iso, D=30):
    """Oracle helix-length score: each maximal stacked run of length m adds
    isolated (m==1), cache_hl[m] (2<=m<D) or cache_hl[D] (m>=D), where
    cache_hl[m] = sum_{t<=m} helix_length_at_least[t] (ipp:1127-1131,
    FC recursion :3525-3555)."""
    ps = set(pairs)
    hl = np.cumsum(hl_at_least)
    extra = 0.0
    for (a, b) in pairs:
        if (a - 1, b + 1) in ps:
            continue                       # not a helix start
        m = 0
        while (a + m, b - m) in ps:
            m += 1
        extra += iso if m == 1 else hl[min(m, D)]
    return extra


def _helix_weights(seed=7):
    rng = np.random.default_rng(seed)
    la = rng.normal(0, 0.25, size=31)
    iso = float(rng.normal(0, 0.5))
    return la, iso


@pytest.mark.parametrize("seq", ["GGCGAAAACGUCC", "GGGGAAAACCCC"])
def test_cf_helix_features_vs_enumeration(seq):
    """logZ/bpp with nonzero helix-length + isolated weights == enumeration
    with the per-maximal-helix oracle scoring."""
    from ractip_tpu.ops.contrafold import cf_helix_features
    tb = np_tables()
    la, iso = _helix_weights()
    n = len(seq)
    scores, plist = [], []
    for pairs in enum_structures(seq):
        sc = score_structure(tb, seq, pairs)
        if sc is not None:
            scores.append(sc + helix_extra(pairs, la, iso))
            plist.append(pairs)
    scores = np.array(scores)
    m = scores.max()
    w = np.exp(scores - m)
    z = w.sum()
    logz_o = np.log(z) + m
    bpp_o = np.zeros((n, n))
    for wk, pairs in zip(w, plist):
        for (a, b) in pairs:
            bpp_o[a - 1, b - 1] += wk / z
    S = encode(seq, n + 2)
    h = cf_helix_features(la, iso)
    logz = cf_logz(S, n, helix=h)
    assert float(logz) == pytest.approx(logz_o, abs=1e-9), seq
    bpp = np.asarray(cf_base_pair_probs(S, n, helix=h))[:n, :n]
    np.testing.assert_allclose(bpp, bpp_o, atol=1e-9)


@pytest.mark.parametrize("seq", ["GGCGAAAACGUCC", "GGGGAAAACCCC"])
def test_cf_helix_viterbi_vs_enumeration(seq):
    """Max semiring + gradient traceback under helix features == brute-force
    argmax; strongly negative isolated weight suppresses length-1 helices."""
    from ractip_tpu.ops.contrafold import cf_helix_features, cf_viterbi
    tb = np_tables()
    la, iso = _helix_weights(seed=11)
    iso = -5.0                             # forbid isolated pairs outright
    n = len(seq)
    best, bestp = None, None
    for pairs in enum_structures(seq):
        sc = score_structure(tb, seq, pairs)
        if sc is None:
            continue
        sc += helix_extra(pairs, la, iso)
        if best is None or sc > best:
            best, bestp = sc, pairs
    S = encode(seq, n + 2)
    score, mapping = cf_viterbi(S, n, helix=cf_helix_features(la, iso))
    assert float(score) == pytest.approx(best, abs=1e-8), seq
    mp = np.asarray(mapping)
    pairs = sorted((i + 1, int(mp[i]) + 1) for i in range(n)
                   if 0 <= mp[i] and i < mp[i])
    sc = score_structure(tb, seq, pairs) + helix_extra(pairs, la, iso)
    assert sc == pytest.approx(best, abs=1e-8)


def test_cf_helix_zero_weights_long_helix():
    """Zero-weight helix grammar == default grammar on a sequence whose
    optimum is a >=D_HELIX-long helix (exercises the FE extension table)."""
    from ractip_tpu.ops.contrafold import cf_helix_features
    seq = "G" * 34 + "AAAA" + "C" * 34
    n = len(seq)
    S = encode(seq, n)
    h0 = cf_helix_features()
    z0, z1 = cf_logz(S, n), cf_logz(S, n, helix=h0)
    assert float(z0) == pytest.approx(float(z1), rel=1e-12)
    b0 = np.asarray(cf_base_pair_probs(S, n))
    b1 = np.asarray(cf_base_pair_probs(S, n, helix=h0))
    np.testing.assert_allclose(b1, b0, atol=1e-9)
    # the ensemble really contains >=30-stack helices
    assert b0[2, n - 3] > 0.5
