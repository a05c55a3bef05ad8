#!/usr/bin/env python
"""F-measure across the 8-pair corpus under the span-loop penalty variants
(DIS audit follow-up): does the delta that flips DIS to golden cost the
other pairs? Host path (exact), CPU."""
import sys
import numpy as np
import jax.numpy as jnp

from ractip_tpu.evaluate.corpus import evaluate_corpus
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.ractip import Options, Posteriors, solve_pair

params = get_default_params()
opts = Options()
deltas = [float(x) for x in sys.argv[1:]] or [0.4, 0.5]

def run(delta):
    def predict(fa1, fa2):
        post = Posteriors(params, fa1.seq, fa2.seq, opts.max_w, True)
        if delta is not None:
            n1, n2 = len(fa1.seq), len(fa2.seq)
            S1 = jnp.asarray(encode(fa1.seq, bucket_length(n1)))
            S2 = jnp.asarray(encode(fa2.seq, bucket_length(n2)))
            post.hp = np.asarray(cofold_hybrid_probs(
                params, S1, S2, jnp.int32(n1), jnp.int32(n2),
                span_loop_penalty=delta))
        r1, r2, obj, _, _ = solve_pair(params, fa1, fa2, opts, post=post)
        return r1, r2
    res = evaluate_corpus(predict)
    print(f"\n=== delta={delta} ===")
    fs = []
    for name, m in res["per_pair"].items():
        fe, fi, fa_ = (m["external"][2], m["internal"][2], m["all"][2])
        fs.append((fe, fi, fa_))
        print(f"  {name:15s} Fext {fe:.3f}  Fint {fi:.3f}  Fall {fa_:.3f}")
    a = np.mean(np.asarray(fs), axis=0)
    print(f"  {'MEAN':15s} Fext {a[0]:.3f}  Fint {a[1]:.3f}  Fall {a[2]:.3f}")

for d in deltas:
    run(d if d >= 0 else None)
