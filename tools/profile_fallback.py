#!/usr/bin/env python
"""Round-5: why is the certified-exact bench slow? Count gap instances at the
bench operating point, their gap sizes, and the per-instance host B&B cost."""
import time

import numpy as np

from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline import batched
from ractip_tpu.pipeline.ractip import Options
from ractip_tpu.pipeline.shuffle import dinuc_shuffle
from ractip_tpu.ops.seq import bucket_length, encode
import jax
import jax.numpy as jnp

BATCH, ITERS = 128, 4000
_DATA = _ddd()
fa1 = load_fasta(_DATA + "/CopA.fa")[0]
fa2 = load_fasta(_DATA + "/CopT.fa")[0]
opts = Options()
cfg = opts.solver_cfg()
params = get_default_params()
rng = np.random.default_rng(0)
decoys = [(dinuc_shuffle(fa1.seq, rng), dinuc_shuffle(fa2.seq, rng))
          for _ in range(BATCH)]
L1 = max(bucket_length(len(a)) for a, _ in decoys)
L2 = max(bucket_length(len(b)) for _, b in decoys)
S1 = np.stack([encode(a, L1) for a, _ in decoys])
S2 = np.stack([encode(b, L2) for _, b in decoys])
n1 = np.array([len(a) for a, _ in decoys], np.int32)
n2 = np.array([len(b) for _, b in decoys], np.int32)

for it in (ITERS,):
    out = batched.predict_device(params, jnp.asarray(S1), jnp.asarray(n1),
                                 jnp.asarray(S2), jnp.asarray(n2), cfg,
                                 buckets=batched.DEFAULT_BUCKETS, iters=it,
                                 packed=True)
    t0 = time.perf_counter()
    out = batched.predict_device(params, jnp.asarray(S1), jnp.asarray(n1),
                                 jnp.asarray(S2), jnp.asarray(n2), cfg,
                                 buckets=batched.DEFAULT_BUCKETS, iters=it,
                                 packed=True)
    t1 = time.perf_counter()
    gaps = np.asarray(out["bound"] - out["obj"])
    idx = np.where(gaps > 1e-4)[0]
    print(f"iters={it}: device {t1-t0:.2f}s; gap instances {len(idx)}/{BATCH}")
    print("gap percentiles (all):", np.percentile(gaps, [50, 90, 99]).round(5))
    if len(idx):
        print("gap sizes of offenders:", np.sort(gaps[idx])[::-1][:10].round(4))

# time host B&B on the first few offenders
from ractip_tpu.solver.bnb import solve_joint
times = []
for b in idx[:5]:
    prob = batched._tree_index(out["prob"], int(b))
    t0 = time.perf_counter()
    u, obj, bound, nodes = solve_joint(prob, cfg, S1.shape[1], S2.shape[1], iters=ITERS)
    times.append(time.perf_counter() - t0)
    print(f"b={b}: bnb {times[-1]:.2f}s nodes={nodes} obj={obj:.4f} "
          f"dev_obj={float(out['obj'][b]):.4f} dev_bound={float(out['bound'][b]):.4f}")
print("mean bnb time:", np.mean(times) if times else 0.0,
      "=> est fallback wall:", (np.mean(times) * len(idx) if times else 0.0))
