#!/usr/bin/env python
"""Component timing of the Pallas fold at bench shape (B=128, L=96)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

params = get_default_params()
bt = get_boltz(params)
rng = np.random.default_rng(0)
B, L = 128, 96
seqs = ["".join(rng.choice(list("ACGU"), L - 10)) for _ in range(B)]
S = jnp.asarray(np.stack([encode(s, L) for s in seqs]))
n = jnp.asarray(np.full(B, L - 10, np.int32))
es = jnp.full((B,), sp.SCALE_E0, jnp.float32)


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def factors_fn(S, n, es):
    sig = jnp.exp(-es / jnp.float32(bt.kt))
    ff = sp._batch_factors(bt, S, n, sig)
    w2k, bulge_k, pows = sp._sig_tables(bt, sig)
    return ff, w2k, bulge_k, pows, sig

ff, w2k, bulge_k, pows, sig = timeit("factors (XLA)", factors_fn, S, n, es)


@jax.jit
def transpose_fn(ff):
    return tuple(sp._to_cbl(getattr(ff, f)) for f in sp.FACTOR_FIELDS)

fcbl = timeit("15 transposes", transpose_fn, ff)

for b_blk in (8, 16, 32, 64, 128):
    fn = jax.jit(lambda fcbl, w2k, bulge_k, sig, pows, b=b_blk:
                 sp.inside_pallas_streamed(fcbl, w2k, bulge_k, sig[:, None],
                                           pows, L, B, b, False, unroll=True))
    try:
        out = timeit(f"inside b{b_blk}", fn, fcbl, w2k, bulge_k, sig,
                     pows)
    except Exception as e:
        print(f"inside b{b_blk} FAILED: {str(e)[:200]}", flush=True)

qm1_c, qb_c, qm_c, qm2_c, q1 = out
qb = sp._from_cbl(qb_c)
qmT = jnp.transpose(sp._from_cbl(qm_c), (1, 0, 2))
qbe = qb * ff.fe
q1pad = jnp.concatenate([jnp.ones((B, 1), jnp.float32), q1[:, :-1]], axis=1)

fnq2 = jax.jit(lambda qbe, sig, n: sp.q2_pallas(
    qbe, sig[:, None], n[:, None], L, B, 8, False))
q2 = timeit("q2_pallas b8", fnq2, qbe, sig, n)

for b_blk in (8, 32, 128):
    fno = jax.jit(lambda fcbl, qmT, qm1_c, q1pad, q2, w2k, bulge_k, sig,
                  pows, b=b_blk: sp.outside_pallas_streamed(
                      fcbl, qmT, qm1_c, q1pad, q2, w2k, bulge_k,
                      sig[:, None], pows, L, B, b, False, unroll=True))
    try:
        timeit(f"outside b{b_blk}", fno, fcbl, qmT, qm1_c, q1pad, q2,
               w2k, bulge_k, sig, pows)
    except Exception as e:
        print(f"outside b{b_blk} FAILED: {str(e)[:200]}", flush=True)

for b_blk in (32, 128):
    fnall = jax.jit(lambda S, n, b=b_blk: sp.batch_fold(
        params, S, n, b_blk=b)["bpp"])
    try:
        timeit(f"batch_fold b{b_blk}", fnall, S, n)
    except Exception as e:
        print(f"batch_fold b{b_blk} FAILED: {str(e)[:200]}", flush=True)
