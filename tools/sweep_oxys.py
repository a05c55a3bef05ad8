#!/usr/bin/env python
"""Alpha / th_hy sensitivity sweep over the curated corpus (VERDICT round-3
item 9: the weak-external pairs, led by OxyS-fhlA whose curated kissing
sites carry posterior mass below the default th_hy=0.1 candidate cutoff).

For each (alpha, th_hy) config: one batched 8-pair dispatch at the accuracy
operating point, scored with the eval.rb-equivalent; prints per-pair F_ext
and the corpus means so RESULTS.md can quantify what recovers the curated
sites and what it costs the strong pairs.  (Reference protocol:
utils/eval.rb; objective coefficients src/ractip.cpp:564,:605.)
"""
import argparse
import time

import numpy as np

from ractip_tpu.evaluate.corpus import corpus_pairs, load_answers
from ractip_tpu.evaluate.fmeasure import PairSets, evaluate
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.batched import predict_batch
from ractip_tpu.pipeline.ractip import Options

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("--iters", type=int, default=4000)
ap.add_argument("--grid", type=str,
                default="0.7:0.1,0.7:0.05,0.7:0.02,1.5:0.02,0.5:0.1",
                help="comma list of alpha:th_hy configs")
args = ap.parse_args()

params = get_default_params()
answers = load_answers()
names, pairs = [], []
for name, fa1, fa2 in corpus_pairs():
    names.append(name)
    pairs.append((fa1.seq, fa2.seq))

configs = []
for tok in args.grid.split(","):
    a, t = tok.split(":")
    configs.append((float(a), float(t)))

print(f"{'alpha':>6s} {'th_hy':>6s}  " + " ".join(f"{n[:9]:>9s}" for n in names)
      + f"  {'mF_ext':>6s} {'mF_int':>6s} {'mF_all':>6s}  wall", flush=True)
for alpha, th_hy in configs:
    opts = Options(alpha=alpha, th_hy=th_hy)
    t0 = time.perf_counter()
    res = predict_batch(params, pairs, opts, chunk=len(pairs),
                        iters=args.iters, buckets=(128, 128, 128, 512, 512),
                        exact_gap_tol=1e-4)
    wall = time.perf_counter() - t0
    fe, fi, fa = [], [], []
    for i, name in enumerate(names):
        (n1, s1, b1), (n2, s2, b2) = answers[name]
        m = evaluate(PairSets.from_brackets(b1, b2),
                     PairSets.from_brackets(res.r1[i], res.r2[i]))
        fe.append(m["external"][2])
        fi.append(m["internal"][2])
        fa.append(m["all"][2])
    print(f"{alpha:6.2f} {th_hy:6.3f}  "
          + " ".join(f"{v:9.3f}" for v in fe)
          + f"  {np.mean(fe):6.3f} {np.mean(fi):6.3f} {np.mean(fa):6.3f}"
          f"  {wall:5.0f}s", flush=True)
