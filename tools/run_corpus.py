#!/usr/bin/env python
"""Corpus accuracy sweep (RESULTS.md protocol) on the current stack.

All 8 curated pairs in ONE batched dispatch at the accuracy operating point
(iters=4000, buckets=(128,128,128,512,512)), with the exact host-B&B
fallback closing any device/bound gap; scored with the eval.rb-equivalent.

Sharding: with >1 visible device (or a JAX_COORDINATOR pod config) the
batch axis runs over the (pairs, replicates) scenario mesh.  --records
streams one PairRecord JSONL line per pair (brackets, objective, certified
bound, F-measures, timings).
"""
import argparse
import time

import numpy as np

from ractip_tpu.evaluate.corpus import corpus_pairs, load_answers
from ractip_tpu.evaluate.fmeasure import PairSets, evaluate
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.batched import predict_batch
from ractip_tpu.pipeline.ractip import Options
from ractip_tpu.utils.timing import StageTimer

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("--iters", type=int, default=4000)
ap.add_argument("--records", type=str, default=None, metavar="PATH",
                help="write one PairRecord JSONL line per pair to PATH")
ap.add_argument("--no-mesh", dest="mesh", action="store_false", default=True)
ap.add_argument("--exact-gap-tol", type=float, default=1e-4)
args = ap.parse_args()

opts = Options()
params = get_default_params()
answers = load_answers()
names, pairs = [], []
for name, fa1, fa2 in corpus_pairs():
    names.append(name)
    pairs.append((fa1.seq, fa2.seq))

mesh = None
if args.mesh:
    import jax
    from ractip_tpu.parallel import init_distributed, scenario_mesh
    init_distributed()
    if len(jax.devices()) > 1:
        mesh = scenario_mesh()

timer = StageTimer()
t0 = time.perf_counter()
res = predict_batch(params, pairs, opts, chunk=len(pairs), iters=args.iters,
                    buckets=(128, 128, 128, 512, 512), mesh=mesh,
                    exact_gap_tol=(args.exact_gap_tol
                                   if args.exact_gap_tol > 0 else None),
                    timer=timer)
wall = time.perf_counter() - t0
print(f"total wall (incl. compile): {wall:.1f}s  timings: {timer.json()}",
      flush=True)

tot = {k: [0, 0, 0] for k in ("external", "internal", "all")}
print(f"{'pair':16s} {'F_ext':>6s} {'F_int':>6s} {'F_all':>6s} "
      f"{'obj':>8s} {'bound':>8s} {'gap':>8s} viol")
rows = []
records = []
for i, name in enumerate(names):
    (n1, s1, b1), (n2, s2, b2) = answers[name]
    ans = PairSets.from_brackets(b1, b2)
    prs = PairSets.from_brackets(res.r1[i], res.r2[i])
    m = evaluate(ans, prs)
    gap = float(res.bound[i] - res.objective[i])
    print(f"{name:16s} {m['external'][2]:6.3f} {m['internal'][2]:6.3f} "
          f"{m['all'][2]:6.3f} {res.objective[i]:8.3f} {res.bound[i]:8.3f} "
          f"{gap:8.4f} {res.violation[i]:.0f}", flush=True)
    rows.append((m["external"][2], m["internal"][2], m["all"][2]))
    ex_tp = len(ans.external & prs.external)
    in_tp = (len(ans.internal1 & prs.internal1)
             + len(ans.internal2 & prs.internal2))
    tot["external"][0] += ex_tp
    tot["external"][1] += len(ans.external)
    tot["external"][2] += len(prs.external)
    tot["internal"][0] += in_tp
    tot["internal"][1] += len(ans.internal1) + len(ans.internal2)
    tot["internal"][2] += len(prs.internal1) + len(prs.internal2)
    if args.records:
        from ractip_tpu.utils.records import PairRecord
        a, b = name.split("-", 1) if "-" in name else (name, name)
        records.append(PairRecord(
            name1=a, name2=b, seq1=pairs[i][0], seq2=pairs[i][1],
            r1=res.r1[i], r2=res.r2[i],
            objective=float(res.objective[i]), bound=float(res.bound[i]),
            violation=float(res.violation[i]),
            metrics={k: list(v) for k, v in m.items()}))

mean = np.mean(np.asarray(rows), axis=0)
print(f"mean F (ext, int, all) = ({mean[0]:.3f}, {mean[1]:.3f}, "
      f"{mean[2]:.3f})", flush=True)
print(f"max residual gap: {float(np.max(res.bound - res.objective)):.6f}",
      flush=True)

if args.records:
    from ractip_tpu.utils.records import write_records
    write_records(args.records, records)
    print(f"wrote {len(records)} records to {args.records}", flush=True)
