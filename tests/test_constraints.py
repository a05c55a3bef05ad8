"""-c/--use-constraint: pf-level hard-constraint masks vs filtered enumeration.

The oracle side enumerates every non-crossing structure, drops structures that
contain a banned pair, and accumulates the exact constrained partition
function / posteriors; the DP side must reproduce them through the allow-mask
machinery (ops.constraints -> ops.mccaskill/cofold factor masking).
"""

import math

import jax.numpy as jnp
import numpy as np

from oracles import enumerate_structures
from ractip_tpu.io.fasta import Fasta
from ractip_tpu.ops import constraints as C
from ractip_tpu.ops import energy as E
from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.eos import structure_energy
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params


def constrained_oracle(p, S, allow, cut=None):
    """(Z, bpp) by enumeration, keeping only structures whose pairs are all
    allowed."""
    n = len(S)
    kt = E.kt_cal(p)
    Z = 0.0
    bpp = np.zeros((n, n))
    for s in enumerate_structures(S, cut):
        if any(not allow[i, j] for (i, j) in s):
            continue
        e = structure_energy(p, S, list(s), cut)
        w = math.exp(-e * 10.0 / kt)
        Z += w
        for (i, j) in s:
            bpp[i, j] += w
    return Z, bpp / max(Z, 1e-300)


def test_constraint_string_rewrites():
    # reference src/ractip.cpp:270-290: '[' ']' 'e' -> 'x', rest verbatim
    assert C.fold_constraint_string("((..[[]]ee..x))", 15) == "((..xxxxxx..x))"
    # reference src/ractip.cpp:410-436 over the concatenation
    assert C.cofold_constraint_string("..[[x(", ".]]l..", 6, 6) == \
        "..((xx.))x.."


def test_allow_matrix_semantics():
    a = C.allow_from_db(".x.", 4)
    assert not a[1].any() and not a[:, 1].any()
    assert a[0, 2] and a[3, 3]
    # matched brackets pin the partner
    a = C.allow_from_db("(..)", 4)
    assert a[0, 3] and a[3, 0]
    assert not a[0, 1] and not a[0, 2] and not a[1, 3]
    # unmatched '(' restricts to downstream partners
    a = C.allow_from_db("..(", 5)
    assert not a[0, 2] and not a[1, 2] and a[2, 3] and a[2, 4]


def test_matched_pair_crossing_exclusion():
    # Vienna semantics (make_ptypes / 2.x hard constraints): a forced pair
    # (i, j) bans EVERY pair crossing the span -- (k,l) with k<i<=l<=j or
    # i<=k<=j<l -- even in structures that do not realize (i, j) itself.
    # These assertions encode the interval rule directly, independent of the
    # enumeration oracle's mask.
    a = C.allow_from_db("..(.....)...", 12)   # forced pair (2, 8)
    assert a[2, 8] and a[8, 2]
    # k < i <= l <= j: crossing from outside into the span
    assert not a[0, 5] and not a[1, 8] and not a[0, 2]
    # i <= k <= j < l: crossing from the span outward
    assert not a[3, 10] and not a[5, 11] and not a[8, 9]
    # nested, enclosing, and disjoint pairs remain allowed
    assert a[3, 7] and a[1, 9] and a[10, 11]


def _fold_bpp(seq, cstr, L=24):
    p = get_default_params()
    S = encode(seq, L)
    allow = C.fold_allow(cstr, len(seq), L)
    bpp = mc.base_pair_probs(p, jnp.asarray(S), jnp.int32(len(seq)),
                             jnp.float64, allow=allow)
    return np.asarray(bpp)


def test_fold_x_constraint_vs_enumeration():
    seq = "GGCGAAAGCUAAC"
    cstr = "..x......x..."
    p = get_default_params()
    S = encode(seq)
    n = len(seq)
    allow = C.allow_from_db(C.fold_constraint_string(cstr, n), n)
    _, bpp_o = constrained_oracle(p, S, allow)
    bpp = _fold_bpp(seq, cstr)
    np.testing.assert_allclose(bpp[:n, :n], bpp_o, atol=1e-10)
    assert bpp[2, :].max() == 0 and bpp[:, 9].max() == 0


def test_fold_interaction_site_chars_banned():
    # '[' ']' 'e' all map to x for the single-sequence fold
    seq = "GGGAAACCCAAGG"
    cstr = "...[[]].e...."
    bpp = _fold_bpp(seq, cstr)
    for k in (3, 4, 5, 6, 8):
        assert bpp[k, :].max() == 0 and bpp[:, k].max() == 0


def test_fold_forced_pair_vs_enumeration():
    seq = "GGCGAAAGCUAAC"
    cstr = "(......)....."         # matched pair (0, 7): 0/7 pair only each other
    p = get_default_params()
    S = encode(seq)
    n = len(seq)
    allow = C.allow_from_db(cstr, n)
    _, bpp_o = constrained_oracle(p, S, allow)
    bpp = _fold_bpp(seq, cstr)
    np.testing.assert_allclose(bpp[:n, :n], bpp_o, atol=1e-10)
    assert bpp[0, 1:7].max() == 0 and bpp[1:7, 7].max() == 0


def test_cofold_constraint_vs_enumeration():
    s1, s2 = "GCGAAC", "GUUCGC"
    cstr1, cstr2 = "..[[[.", ".]]].."
    n1, n2 = len(s1), len(s2)
    p = get_default_params()
    cc = C.cofold_constraint_string(cstr1, cstr2, n1, n2)
    allow = C.allow_from_db(cc, n1 + n2)
    Sc = np.concatenate([encode(s1), encode(s2)])
    _, bpp_o = constrained_oracle(p, Sc, allow, cut=n1)
    hp_o = bpp_o[:n1, n1:]

    L1 = L2 = 8
    hp = np.asarray(cofold_hybrid_probs(
        get_default_params(), jnp.asarray(encode(s1, L1)),
        jnp.asarray(encode(s2, L2)), jnp.int32(n1), jnp.int32(n2),
        jnp.float64,
        allow=C.cofold_allow(cstr1, cstr2, n1, n2, L1 + L2)))
    np.testing.assert_allclose(hp[:n1, :n2], hp_o, atol=1e-9)
    # the '[' positions may only pair downstream (across the cut)
    assert hp[2:5, :].sum() > 0


def test_pipeline_constraint_smoke(tmp_path):
    from ractip_tpu.pipeline.ractip import Options, predict
    fa1 = Fasta("s1", "GGGAAACCCAAGGG", "xxx...........")
    fa2 = Fasta("s2", "CCCUUUGGG")
    opts = Options(use_constraint=True)
    pred = predict(fa1, fa2, opts)
    # the x-ed bases may still take part in *external* pairs but never
    # internal ones
    assert all(ch in ".[" for ch in pred.r1[:3])
