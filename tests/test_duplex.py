"""Duplex inside/outside DP vs brute-force chain enumeration.

The duplex ensemble (reference src/pf_duplex.c:67-206) is every chain of
inter-strand pairs (i_1 < ... < i_p in s1, j_1 > ... > j_p in s2) whose
consecutive pairs are joined by interior loops of total unpaired size
<= MAXLOOP, scored with duplex-init + exterior-end dangles at both helix ends.
The oracle enumerates all chains and scores each via the scalar energy model
(ractip_tpu.ops.energy), which the DP must reproduce exactly in float64.
"""

import itertools
import math

import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.constants import MAXLOOP, PAIR_TYPE, RTYPE
from ractip_tpu.ops import energy as E
from ractip_tpu.ops.duplex import duplex
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params


def duplex_oracle(p, S1, S2):
    """Exact (Zd, pr) by chain enumeration.  Feasible for n1, n2 <= ~9."""
    n1, n2 = len(S1), len(S2)
    kt = E.kt_cal(p)
    cands = [(i, j) for i in range(n1) for j in range(n2)
             if PAIR_TYPE[S1[i]][S2[j]] > 0]

    def end5(i, j):
        t = PAIR_TYPE[S1[i]][S2[j]]
        s5 = int(S1[i - 1]) if i > 0 else -1
        s3 = int(S2[j + 1]) if j < n2 - 1 else -1
        return p.duplex_init + E.e_ext_stem(p, t, s5, s3)

    def end3(i, j):
        t = PAIR_TYPE[S1[i]][S2[j]]
        s5 = int(S2[j - 1]) if j > 0 else -1
        s3 = int(S1[i + 1]) if i < n1 - 1 else -1
        return E.e_ext_stem(p, RTYPE[t], s5, s3)

    def loop(k, l, i, j):
        # previous pair (k, l), next pair (i, j): i > k, j < l
        u1, u2 = i - k - 1, l - j - 1
        if u1 + u2 > MAXLOOP:
            return None
        t = PAIR_TYPE[S1[k]][S2[l]]
        t2 = RTYPE[PAIR_TYPE[S1[i]][S2[j]]]
        return E.e_intloop(p, u1, u2, t, t2,
                           int(S1[k + 1]), int(S2[l - 1]),
                           int(S1[i - 1]), int(S2[j + 1]))

    Zd = 0.0
    pr = np.zeros((n1, n2))

    # DP-free explicit enumeration over all chains (depth-first).
    def extend(chain, e_so_far):
        nonlocal Zd
        i0, j0 = chain[-1]
        e_total = e_so_far + end3(i0, j0)
        w = math.exp(-e_total * 10.0 / kt)
        Zd += w
        for (i, j) in chain:
            pr[i, j] += w
        for (i, j) in cands:
            if i > i0 and j < j0:
                le = loop(i0, j0, i, j)
                if le is not None:
                    extend(chain + [(i, j)], e_so_far + le)

    for (i, j) in cands:
        extend([(i, j)], end5(i, j))

    return Zd, pr / Zd


SEQS = [
    ("GCAGCC", "GGCUGC"),
    ("AAUUGCG", "CGCAAUU"),
    ("GGGAAACCC", "GGGUUUCCC"),
    ("ACGUACGU", "ACGUACGU"),
    ("UUUUUUU", "AAAAAAA"),
]


@pytest.mark.parametrize("s1,s2", SEQS)
def test_duplex_matches_enumeration(s1, s2):
    p = get_default_params()
    S1, S2 = encode(s1), encode(s2)
    Zd, pr = duplex_oracle(p, S1, S2)

    res = duplex(p, jnp.asarray(S1), jnp.asarray(S2),
                 jnp.int32(len(S1)), jnp.int32(len(S2)), dtype=jnp.float64)
    np.testing.assert_allclose(float(res.log_zd), math.log(Zd), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res.pr), pr, atol=1e-12, rtol=1e-8)


def test_duplex_padding_invariance():
    """Padded (bucketed) sequences give identical posteriors in the live region."""
    p = get_default_params()
    s1, s2 = "GGGAAACCC", "GGGUUUCCC"
    S1, S2 = encode(s1), encode(s2)
    r0 = duplex(p, jnp.asarray(S1), jnp.asarray(S2),
                jnp.int32(len(s1)), jnp.int32(len(s2)), dtype=jnp.float64)
    S1p, S2p = encode(s1, 16), encode(s2, 16)
    r1 = duplex(p, jnp.asarray(S1p), jnp.asarray(S2p),
                jnp.int32(len(s1)), jnp.int32(len(s2)), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(r1.pr)[: len(s1), : len(s2)],
                               np.asarray(r0.pr), atol=1e-12)
    np.testing.assert_allclose(float(r1.log_zd), float(r0.log_zd), rtol=1e-12)
