#!/usr/bin/env python
"""Break down where bench.py's batched pipeline time goes (real TPU)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.ractip import Options
from ractip_tpu.pipeline.shuffle import dinuc_shuffle
from ractip_tpu.ops.mccaskill import base_pair_probs
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.accessibility import accessibility
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.solver.device import build_problem_device, solve_joint_device
from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
_DATA = _ddd()

BATCH = 128
ITERS = 1500

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
print(f"L1={L1} L2={L2} (seqs {len(fa1.seq)},{len(fa2.seq)})")
S1 = jnp.asarray(np.stack([encode(a, L1) for a, _ in decoys]))
S2 = jnp.asarray(np.stack([encode(b, L2) for _, b in decoys]))
n1 = jnp.asarray(np.array([len(a) for a, _ in decoys], np.int32))
n2 = jnp.asarray(np.array([len(b) for _, b in decoys], np.int32))

buckets = (64, 64, 64, 128, 128)
max_w = max(1, cfg.max_w)


@jax.jit
def dps(S1, n1, S2, n2):
    def one(s1, m1, s2, m2):
        bpp1 = base_pair_probs(params, s1, m1)
        bpp2 = base_pair_probs(params, s2, m2)
        hp = cofold_hybrid_probs(params, s1, s2, m1, m2)
        pu1 = accessibility(params, s1, m1, max_w)
        pu2 = accessibility(params, s2, m2, max_w)
        return bpp1, bpp2, hp, pu1, pu2
    return jax.vmap(one)(S1, n1, S2, n2)


@jax.jit
def mcc_only(S1, n1):
    return jax.vmap(lambda s, m: base_pair_probs(params, s, m))(S1, n1)


@jax.jit
def cof_only(S1, n1, S2, n2):
    return jax.vmap(lambda a, b, c, d: cofold_hybrid_probs(params, a, c, b, d)
                    )(S1, n1, S2, n2)


@jax.jit
def acc_only(S1, n1):
    return jax.vmap(lambda s, m: accessibility(params, s, m, max_w))(S1, n1)


@jax.jit
def build(bpp1, bpp2, hp, pu1, pu2, n1, n2):
    return jax.vmap(lambda a, b, c, d, e, f, g: build_problem_device(
        a, b, c, d, e, f, g, cfg, buckets))(bpp1, bpp2, hp, pu1, pu2, n1, n2)


@jax.jit
def solve(prob):
    return jax.vmap(lambda p: solve_joint_device(p, cfg, L1, L2, ITERS))(prob)


def bench(name, fn, *args):
    def sync(o):
        leaves = jax.tree_util.tree_leaves(o)
        np.asarray(leaves[0])  # force a real device->host transfer
        jax.block_until_ready(o)
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(1):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:18s} compile+run {tc:7.2f}s   steady {min(ts)*1e3:8.1f} ms")
    return out

bpp1, bpp2, hp, pu1, pu2 = bench("all DPs", dps, S1, n1, S2, n2)
bench("  mccaskill x1", mcc_only, S1, n1)
bench("  cofold", cof_only, S1, n1, S2, n2)
bench("  accessibility", acc_only, S1, n1)
prob = bench("build_problem", build, bpp1, bpp2, hp, pu1, pu2, n1, n2)
bench("solve (2xPDHG)", solve, prob)
