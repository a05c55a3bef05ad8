#!/usr/bin/env python
"""Does PDHG iteration escalation (+restarts) close the certification gap on
the bench decoys, and at what device cost?"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline import batched
from ractip_tpu.pipeline.ractip import Options
from ractip_tpu.pipeline.shuffle import dinuc_shuffle
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.solver.device import solve_joint_device

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

out = batched.predict_device(params, jnp.asarray(S1), jnp.asarray(n1),
                             jnp.asarray(S2), jnp.asarray(n2), cfg,
                             buckets=batched.DEFAULT_BUCKETS, iters=ITERS,
                             packed=True)
gaps = np.asarray(out["bound"] - out["obj"])
idx = np.where(gaps > 1e-4)[0]
print(f"baseline iters={ITERS}: {len(idx)}/{BATCH} gapped; "
      f"max gap {gaps.max():.4f}")

probs = jax.tree_util.tree_map(lambda t: jnp.asarray(t[idx]), out["prob"])

import functools
for it, rs in ((16000, 0), (16000, 7), (64000, 15), (64000, 31)):
    from ractip_tpu.solver import joint_lp
    def one(p):
        u_lp, y, bound = joint_lp.pdhg_solve(p, cfg, L1, L2, iters=it,
                                             restarts=rs)
        from ractip_tpu.solver.device import round_and_repair
        u, _d, mv = round_and_repair(p, cfg, L1, L2, u_lp)
        coefs = (p.xc * p.xm, p.yc * p.ym, p.zc * p.zm, p.vc * p.vm,
                 p.wc * p.wm)
        obj = sum(jnp.vdot(c, t) for c, t in zip(coefs, u))
        return obj, bound, mv
    f = jax.jit(jax.vmap(one))
    r = f(probs); jax.block_until_ready(r)
    t0 = time.perf_counter()
    obj, bound, mv = f(probs)
    jax.block_until_ready(obj)
    dt = time.perf_counter() - t0
    obj = np.maximum(np.asarray(obj), np.asarray(out["obj"][idx]))
    bb = np.minimum(np.asarray(bound), np.asarray(out["bound"][idx]))
    g2 = bb - obj
    print(f"iters={it} restarts={rs}: {np.sum(g2 > 1e-4)}/{len(idx)} still "
          f"gapped, device {dt:.2f}s, max residual gap {g2.max():.5f}, "
          f"median {np.median(g2):.6f}")
