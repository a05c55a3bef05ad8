#!/usr/bin/env python
"""Where does the new batched pipeline spend time? (scalar-output timings)"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline import batched
from ractip_tpu.pipeline.ractip import Options
from ractip_tpu.pipeline.shuffle import dinuc_shuffle
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.solver.device import build_problem_device, solve_joint_device
from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
_DATA = _ddd()

BATCH, ITERS = 128, 1500
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
S1 = jnp.asarray(np.stack([encode(a, L1) for a, _ in decoys]))
S2 = jnp.asarray(np.stack([encode(b, L2) for _, b in decoys]))
n1 = jnp.asarray(np.array([len(a) for a, _ in decoys], np.int32))
n2 = jnp.asarray(np.array([len(b) for _, b in decoys], np.int32))
buckets = (64, 64, 64, 128, 128)


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {best*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def posteriors(S1, n1, S2, n2):
    return batched._batch_posteriors(params, S1, n1, S2, n2, cfg, False)

bpp1, bpp2, hp, pu1, pu2 = timeit("posteriors (all DPs)", posteriors,
                                  S1, n1, S2, n2)


@jax.jit
def pos_sum(S1, n1, S2, n2):
    r = batched._batch_posteriors(params, S1, n1, S2, n2, cfg, False)
    return sum(jnp.sum(t) for t in r if t is not None)

timeit("posteriors scalar-out", pos_sum, S1, n1, S2, n2)


@jax.jit
def build(bpp1, bpp2, hp, pu1, pu2, n1, n2):
    return jax.vmap(lambda a, b, c, d, e, f, g: build_problem_device(
        a, b, c, d, e, f, g, cfg, buckets))(bpp1, bpp2, hp, pu1, pu2, n1, n2)

prob = timeit("build_problem", build, bpp1, bpp2, hp, pu1, pu2, n1, n2)


@jax.jit
def solve(prob):
    r = jax.vmap(lambda p: solve_joint_device(p, cfg, L1, L2, ITERS))(prob)
    return r

timeit("solve (2xPDHG@1500)", solve, prob)

# full chunk incl. host decode
t0 = time.perf_counter()
out = batched._run_chunk(params, decoys, np.asarray(S1), np.asarray(n1),
                         np.asarray(S2), np.asarray(n2), cfg, opts, buckets,
                         ITERS, False)
print(f"{'full _run_chunk (warm)':30s} {(time.perf_counter()-t0)*1e3:8.1f} ms",
      flush=True)
t0 = time.perf_counter()
out = batched._run_chunk(params, decoys, np.asarray(S1), np.asarray(n1),
                         np.asarray(S2), np.asarray(n2), cfg, opts, buckets,
                         ITERS, False)
print(f"{'full _run_chunk (steady)':30s} {(time.perf_counter()-t0)*1e3:8.1f} ms",
      flush=True)
