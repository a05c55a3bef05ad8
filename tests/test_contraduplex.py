"""CONTRAfold duplex engine vs chain-enumeration oracle.

Enumerates every antiparallel duplex chain (i ascending in s1, j descending
in s2, complementary pairs, inter-pair gaps l1+l2 <= 30) of short strand
pairs and scores each with an independent implementation of the reference's
duplex scoring (reference src/contrafold/DuplexEngine.ipp:1015-1077 inside
cases + :974-1012 LoopScore; note the reference never adds its
cache_score_single length scores in the duplex DP -- mirrored here).
"""

import itertools

import numpy as np
import pytest

from ractip_tpu.ops.contraduplex import cd_hybrid_probs, cd_logz
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.contrafold import get_cf_tables

COMPL = {"AU", "UA", "GU", "UG", "CG", "GC"}


def np_tables():
    tb = get_cf_tables()
    return {k: np.asarray(v) for k, v in tb._asdict().items()}


def enum_chains(seq1: str, seq2: str):
    """All chains [(i1,j1),...,(ik,jk)], i asc / j desc, gaps <= 30 (1-based)."""
    n1, n2 = len(seq1), len(seq2)
    pairs = [(i, j) for i in range(1, n1 + 1) for j in range(1, n2 + 1)
             if seq1[i - 1] + seq2[j - 1] in COMPL]

    chains = []

    def extend(chain):
        chains.append(chain)
        i0, j0 = chain[-1]
        for (i, j) in pairs:
            if i > i0 and j < j0 and (i - i0 - 1) + (j0 - j - 1) <= 30:
                extend(chain + [(i, j)])

    for p in pairs:
        extend([p])
    return chains


def score_chain(tb, seq1, seq2, chain):
    n1, n2 = len(seq1), len(seq2)
    s1 = np.concatenate([[0], encode(seq1), [0]])
    s2 = np.concatenate([[0], encode(seq2), [0]])
    (i0, j0) = chain[0]
    v = tb["ext_unpaired"] * ((i0 - 1) + (n2 - j0))
    if i0 > 1:
        v += tb["dangle_r"][s2[j0], s1[i0], s1[i0 - 1]]
    if j0 < n2:
        v += tb["dangle_l"][s2[j0], s1[i0], s2[j0 + 1]]
    v += tb["bp"][s2[j0], s1[i0]] + tb["closing"][s2[j0], s1[i0]]
    for (p, q), (i, j) in zip(chain, chain[1:]):
        l1, l2 = i - p - 1, q - j - 1
        if l1 == 0 and l2 == 0:
            v += tb["bp"][s1[i], s2[j]] + tb["stack"][s1[p], s2[q],
                                                      s1[i], s2[j]]
        else:
            v += (tb["tm"][s1[p], s2[q], s1[p + 1], s2[q - 1]]
                  + tb["tm"][s2[j], s1[i], s2[j + 1], s1[i - 1]]
                  + tb["bp"][s1[i], s2[j]])
            if l1 == 0 and l2 == 1:
                v += tb["bulge0x1"][s2[q - 1]]
            if l1 == 1 and l2 == 0:
                v += tb["bulge0x1"][s1[p + 1]]
            if l1 == 1 and l2 == 1:
                v += tb["int1x1"][s1[p + 1], s2[q - 1]]
    (ik, jk) = chain[-1]
    v += tb["ext_unpaired"] * ((n1 - ik) + (jk - 1))
    if ik < n1:
        v += tb["dangle_l"][s1[ik], s2[jk], s1[ik + 1]]
    if jk > 1:
        v += tb["dangle_r"][s1[ik], s2[jk], s2[jk - 1]]
    v += tb["closing"][s1[ik], s2[jk]]
    return v


def oracle(seq1, seq2):
    tb = np_tables()
    n1, n2 = len(seq1), len(seq2)
    chains = enum_chains(seq1, seq2)
    scores = np.array([score_chain(tb, seq1, seq2, c) for c in chains])
    m = scores.max()
    w = np.exp(scores - m)
    z = w.sum()
    bpp = np.zeros((n1, n2))
    for wk, chain in zip(w, chains):
        for (i, j) in chain:
            bpp[i - 1, j - 1] += wk / z
    return np.log(z) + m, bpp


PAIRS = [("GCGAC", "GUCGC"), ("ACGUAC", "GUACGU"), ("GGGG", "CCCC")]


@pytest.mark.parametrize("seq1,seq2", PAIRS)
def test_cd_logz_and_posterior_vs_enumeration(seq1, seq2):
    logz_o, bpp_o = oracle(seq1, seq2)
    n1, n2 = len(seq1), len(seq2)
    L1, L2 = n1 + 2, n2 + 3   # exercise padding
    S1, S2 = encode(seq1, L1), encode(seq2, L2)
    logz = float(cd_logz(S1, S2, n1, n2))
    assert logz == pytest.approx(logz_o, abs=1e-8)
    hp = np.asarray(cd_hybrid_probs(S1, S2, n1, n2))
    np.testing.assert_allclose(hp[:n1, :n2], bpp_o, atol=1e-9)
    assert np.all(hp[n1:, :] == 0) and np.all(hp[:, n2:] == 0)
