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

GOLD1 = "((((.(((((((..[[[[[[.)))))))...))))"
GOLD2 = "((((.(((((((..]]]]]].)))))))...))))"

fa1 = load_fasta("/root/reference/data/DIS.fa")[0]
fa2 = load_fasta("/root/reference/data/DIS.fa")[0]
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
