#!/usr/bin/env python
"""Locate the ~800ms gap between device components and _run_chunk total."""
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
S1 = np.stack([encode(a, L1) for a, _ in decoys])
S2 = np.stack([encode(b, L2) for _, b in decoys])
n1 = np.array([len(a) for a, _ in decoys], np.int32)
n2 = np.array([len(b) for _, b in decoys], np.int32)
buckets = (64, 64, 64, 128, 128)

# warm
out = batched.predict_device(params, jnp.asarray(S1), jnp.asarray(n1),
                             jnp.asarray(S2), jnp.asarray(n2), cfg,
                             buckets=buckets, iters=ITERS)
jax.block_until_ready(out)

for _ in range(2):
    t0 = time.perf_counter()
    out = batched.predict_device(params, jnp.asarray(S1), jnp.asarray(n1),
                                 jnp.asarray(S2), jnp.asarray(n2), cfg,
                                 buckets=buckets, iters=ITERS)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    outh = jax.tree_util.tree_map(np.asarray, out)
    t2 = time.perf_counter()
    B = len(decoys)
    r1s, r2s = [], []
    for b in range(B):
        prob = batched._tree_index(outh["prob"], b)
        u = tuple(np.asarray(t[b]) for t in outh["u"])
        r1, r2 = batched.decode_brackets(prob, u, int(n1[b]), int(n2[b]),
                                         cfg.in_pk and cfg.structure)
        r1s.append(r1)
        r2s.append(r2)
    t3 = time.perf_counter()
    nb = sum(x.nbytes for x in jax.tree_util.tree_leaves(outh))
    print(f"device {1e3*(t1-t0):8.1f} ms  transfer {1e3*(t2-t1):8.1f} ms "
          f"({nb/1e6:.1f} MB)  host-decode {1e3*(t3-t2):8.1f} ms", flush=True)
