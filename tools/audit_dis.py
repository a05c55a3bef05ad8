#!/usr/bin/env python
"""DIS x DIS golden-output audit (reference README.md:92-99).

Scores the reference's golden joint structure and our predicted structure
under OUR posterior matrices, prints the per-pair posterior contributions of
every differing pair, and states which side the ILP objective favors.  This
pins whether the deviation is a solver artifact (it is not: the solver is
certified) or a posterior-calibration difference vs ViennaRNA -- and exactly
which entries carry it.
"""
import numpy as np

from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.ractip import Options, Posteriors, solve_pair
from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
_DATA = _ddd()

GOLD1 = "((((.(((((((..[[[[[[.)))))))...))))"
GOLD2 = "((((.(((((((..]]]]]].)))))))...))))"

fa1 = load_fasta(_DATA + "/DIS.fa")[0]
fa2 = load_fasta(_DATA + "/DIS.fa")[0]
opts = Options()
params = get_default_params()

post = Posteriors(params, fa1.seq, fa2.seq, opts.max_w, True)
r1, r2, obj, _, _ = solve_pair(params, fa1, fa2, opts, post=post)
print(f"ours:   {r1}\n        {r2}\ngolden: {GOLD1}\n        {GOLD2}")


def pairs_of(r1, r2):
    intern1, intern2, ext = [], [], []
    for r, out in ((r1, intern1), (r2, intern2)):
        st = []
        for i, ch in enumerate(r):
            if ch == "(":
                st.append(i)
            elif ch == ")":
                out.append((st.pop(), i))
    q = [j for j, ch in enumerate(r2) if ch == "]"]
    for i, ch in enumerate(r1):
        if ch == "[":
            ext.append((i, q.pop()))
    return intern1, intern2, ext


def objective(r1, r2):
    i1, i2, ex = pairs_of(r1, r2)
    o = sum(post.bpp1[i, j] - opts.th_ss for i, j in i1)
    o += sum(post.bpp2[i, j] - opts.th_ss for i, j in i2)
    o += sum(opts.alpha * (post.hp[i, j] - opts.th_hy) for i, j in ex)
    return o


print(f"\nILP objective (our posteriors): ours={objective(r1, r2):.4f}  "
      f"golden={objective(GOLD1, GOLD2):.4f}  (solver obj={obj:.4f})")

oi1, oi2, oex = map(set, pairs_of(r1, r2))
gi1, gi2, gex = map(set, pairs_of(GOLD1, GOLD2))
print("\npairs only in OURS:")
for i, j in sorted(oi1 - gi1):
    print(f"  s1 internal ({i:2d},{j:2d})  bpp={post.bpp1[i, j]:.4f}")
for i, j in sorted(oex - gex):
    print(f"  external    ({i:2d},{j:2d})  hp ={post.hp[i, j]:.4f}")
print("pairs only in GOLDEN:")
for i, j in sorted(gi1 - oi1):
    print(f"  s1 internal ({i:2d},{j:2d})  bpp={post.bpp1[i, j]:.4f}")
for i, j in sorted(gex - oex):
    print(f"  external    ({i:2d},{j:2d})  hp ={post.hp[i, j]:.4f}")

# ---------------------------------------------------------------------------
# Homodimer-symmetry hypothesis test (round-3 leading hypothesis).
#
# An RNAcofold-style homodimer symmetry correction reweights the joint
# ensemble as w'(s) = w(s)/2 for strand-exchange-SYMMETRIC structures s and
# w'(s) = w(s) otherwise.  For ANY event E (e.g. "pair (i,j') is present"),
# every term of odds'(E) = sum_{s in E} w'(s) / sum_{s notin E} w'(s) lies
# within a factor 2 of the uncorrected term, so
#
#     odds(E)/2  <=  odds'(E)  <=  2*odds(E).
#
# The correction can therefore move a posterior p to at most
# p' in [p/(2-p), 2p/(1+p)] -- an ODDS shift of at most 2x, independent of
# the (hard-to-compute) symmetric partition function Z_sym.  We bound below
# whether ANY such reweighting can flip the ILP preference to the golden
# structure.  (Internal bpp1/bpp2 come from single-strand pf_fold and carry
# no correction; only hp changes.)
# ---------------------------------------------------------------------------
print("\n=== homodimer-symmetry hypothesis bound ===")
ours_obj = objective(r1, r2)
gold_obj = objective(GOLD1, GOLD2)


def objective_sym_worst(r1s, r2s):
    """Objective under the most adversarial symmetry correction: every hp
    entry of THIS structure at its lower bound p/(2-p), i.e. all structures
    carrying the pair symmetric, all others asymmetric."""
    i1, i2, ex = pairs_of(r1s, r2s)
    o = sum(post.bpp1[i, j] - opts.th_ss for i, j in i1)
    o += sum(post.bpp2[i, j] - opts.th_ss for i, j in i2)
    for i, j in ex:
        p = post.hp[i, j]
        o += opts.alpha * (p / (2.0 - p) - opts.th_hy)
    return o


def objective_sym_best(r1s, r2s):
    """Objective with every hp entry at its UPPER bound 2p/(1+p)."""
    i1, i2, ex = pairs_of(r1s, r2s)
    o = sum(post.bpp1[i, j] - opts.th_ss for i, j in i1)
    o += sum(post.bpp2[i, j] - opts.th_ss for i, j in i2)
    for i, j in ex:
        p = post.hp[i, j]
        o += opts.alpha * (2.0 * p / (1.0 + p) - opts.th_hy)
    return o


ours_lo = objective_sym_worst(r1, r2)       # ours penalized maximally
gold_hi = objective_sym_best(GOLD1, GOLD2)  # golden boosted maximally
print(f"uncorrected objective: ours={ours_obj:.4f}  golden={gold_obj:.4f}")
print(f"extreme correction   : ours>={ours_lo:.4f}  golden<={gold_hi:.4f}")
if ours_lo > gold_hi:
    print("DISPROVEN: even the most adversarial symmetry reweighting leaves")
    print("our structure strictly preferred -- a /2 symmetric-weight")
    print("correction shifts posterior odds by at most 2x, but flipping DIS")
    needed = {(i, j): post.hp[i, j] for (i, j) in sorted(oex - gex)}
    for (i, j), p in needed.items():
        print(f"  hp({i},{j}) = {p:.4f} would need to drop below ~0.76 "
              f"(odds shift ~{(p / (1 - p)) / (0.76 / 0.24):.0f}x, i.e. "
              f"dG shift >= {0.6163 * np.log((p / (1 - p)) / (0.76 / 0.24)):.2f} kcal/mol)")
    print("  -> the reference/our difference is a >=2 kcal/mol effect in the")
    print("     cross-cut ensemble model, not a symmetry factor.")
else:
    print("NOT disproven: a symmetry correction of the right size could flip "
          "the preference; implement Z_sym to decide.")
