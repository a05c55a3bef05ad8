#!/usr/bin/env python
"""DIS x DIS audit, round 5: the cut-spanning-helix loop-scoring candidate
(VERDICT round-4 item 2; reference src/ractip.cpp:442-453, README.md:92-99).

Rescores every two-sided loop (stack/1x1/2x1/2x2/bulge/generic interior)
whose CLOSING pair spans the cut with an extra free energy delta
(ops.cofold span_loop_penalty) and measures, per delta:
  * the three diagnostic cross-cut posteriors (the extension pairs
    hp(10,22') / hp(11,21') and a kissing-core pair hp(16,17')),
  * the predicted joint brackets vs the golden output,
so the candidate is either adopted (golden match) or measurably eliminated.
delta=inf is the straw variant "spanning helices get no stacking at all":
it must destroy the kissing helix entirely, which Vienna's co_pf manifestly
does not do (RNAcofold's base use case is duplex binding), bounding how far
any Vienna-side convention can deviate.
"""
import numpy as np
import jax.numpy as jnp

from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.ractip import Options, Posteriors, solve_pair

GOLD1 = "((((.(((((((..[[[[[[.)))))))...))))"
GOLD2 = "((((.(((((((..]]]]]].)))))))...))))"

_DATA = _ddd()
fa1 = load_fasta(_DATA + "/DIS.fa")[0]
fa2 = load_fasta(_DATA + "/DIS.fa")[0]
opts = Options()
params = get_default_params()

n1, n2 = len(fa1.seq), len(fa2.seq)
L1, L2 = bucket_length(n1), bucket_length(n2)
S1 = jnp.asarray(encode(fa1.seq, L1))
S2 = jnp.asarray(encode(fa2.seq, L2))

post = Posteriors(params, fa1.seq, fa2.seq, opts.max_w, True)

print(f"{'delta':>6} {'hp(10,22)':>10} {'hp(11,21)':>10} {'hp(16,17)':>10} "
      f"{'obj':>8}  brackets==golden?")
for delta in (None, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, np.inf):
    hp = np.asarray(cofold_hybrid_probs(
        params, S1, S2, jnp.int32(n1), jnp.int32(n2),
        span_loop_penalty=delta))
    post.hp = hp
    r1, r2, obj, _, _ = solve_pair(params, fa1, fa2, opts, post=post)
    match = (r1 == GOLD1 and r2 == GOLD2)
    d = "base" if delta is None else f"{delta:g}"
    print(f"{d:>6} {hp[10,22]:10.4f} {hp[11,21]:10.4f} {hp[16,17]:10.4f} "
          f"{obj:8.3f}  {match}   {r1}")
