#!/usr/bin/env python
"""End-to-end mRNA-scale accessibility run (VERDICT round-4 item 5).

Pushes one sRNA x ~1knt-mRNA-window pair through the FULL production
`predict_batch` path on the streamed kernel tier -- candidate extraction,
accessibility regions, PDHG + rounding, certified-exactness fallback, bracket
decode -- and reports TPU wall time per stage plus objective certification.
This is the BASELINE config-#3-shaped workload (reference src/ractip.cpp:
308-382, pf_unstru over long targets) at L >= 512, END TO END rather than
kernel-only (round 4 only smoke-tested batch_fold/batch_cofold directly).

Target construction: the real fhlA transcript (110nt, bundled corpus)
embedded at a known offset inside a random-nucleotide context window --
the standard way to build a fixed-length accessibility-mode target when the
corpus ships only the annotated fragment (documented synthetic context; the
sRNA is the real OxyS).  --len selects the window (default 1000 -> bucket
1024).
"""
import argparse
import time

import numpy as np

from ractip_tpu.evaluate.corpus import data_dir_default
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.batched import predict_batch
from ractip_tpu.pipeline.ractip import Options
from ractip_tpu.utils.timing import StageTimer

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("--len", type=int, default=1000, dest="tlen")
ap.add_argument("--iters", type=int, default=4000)
ap.add_argument("--acc-max", action="store_true", default=True)
ap.add_argument("--offset", type=int, default=445)
ap.add_argument("--seed", type=int, default=11)
ap.add_argument("--pair", default="OxyS:fhlA", metavar="SRNA:TARGET",
                help="bundled-corpus names, e.g. CopA:CopT")
args = ap.parse_args()

_D = data_dir_default()
_s, _t = args.pair.split(":")
srna = load_fasta(f"{_D}/{_s}.fa")[0].seq
frag = load_fasta(f"{_D}/{_t}.fa")[0].seq
rng = np.random.default_rng(args.seed)
flank = lambda k: "".join(rng.choice(list("ACGU"), k))
mrna = flank(args.offset) + frag + flank(args.tlen - args.offset - len(frag))
assert len(mrna) == args.tlen
print(f"sRNA {_s} {len(srna)}nt x target {len(mrna)}nt "
      f"(real {_t} at [{args.offset}, {args.offset + len(frag)}))")

params = get_default_params()
opts = Options(acc_max=args.acc_max)
timer = StageTimer()

t0 = time.perf_counter()
res = predict_batch(params, [(srna, mrna)], opts, chunk=1, iters=args.iters,
                    buckets=(64, 64, 128, 512, 1024), timer=timer,
                    exact_gap_tol=1e-4)
wall_total = time.perf_counter() - t0
# steady-state re-run (compiled)
t0 = time.perf_counter()
res = predict_batch(params, [(srna, mrna)], opts, chunk=1, iters=args.iters,
                    buckets=(64, 64, 128, 512, 1024), timer=timer,
                    exact_gap_tol=1e-4)
wall_steady = time.perf_counter() - t0

gap = float(res.bound[0] - res.objective[0])
print(f"wall: first(incl compile) {wall_total:.1f}s, steady {wall_steady:.2f}s")
print(f"objective {float(res.objective[0]):.4f}  certified bound "
      f"{float(res.bound[0]):.4f}  gap {gap:.2e}  violation "
      f"{float(res.violation[0]):.3f}")
print("overflow counters (x,y,z,v,w):", res.overflow[0].tolist())
print(timer.report())
r1, r2 = res.r1[0], res.r2[0]
ext1 = [i for i, ch in enumerate(r1) if ch == "["]
ext2 = [j for j, ch in enumerate(r2) if ch == "]"]
print(f"external pairs: {len(ext1)}; sRNA sites {ext1}")
print(f"target site span: {min(ext2) if ext2 else None}.."
      f"{max(ext2) if ext2 else None} "
      f"(real {_t} fragment spans {args.offset}..{args.offset + len(frag)})")
