#!/usr/bin/env python
"""Measure adaptive-sigma retry counts and fixed-scale DP timings."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.shuffle import dinuc_shuffle
from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops.cofold import cofold_hybrid_probs, cofold
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
_DATA = _ddd()

BATCH = 128
fa1 = load_fasta(_DATA + "/CopA.fa")[0]
fa2 = load_fasta(_DATA + "/CopT.fa")[0]
params = get_default_params()
bt = get_boltz(params)
rng = np.random.default_rng(0)
decoys = [(dinuc_shuffle(fa1.seq, rng), dinuc_shuffle(fa2.seq, rng))
          for _ in range(BATCH)]
L1 = max(bucket_length(len(a)) for a, _ in decoys)
S1 = jnp.asarray(np.stack([encode(a, L1) for a, _ in decoys]))
n1 = jnp.asarray(np.array([len(a) for a, _ in decoys], np.int32))
S2 = jnp.asarray(np.stack([encode(b, L1) for _, b in decoys]))
n2 = jnp.asarray(np.array([len(b) for _, b in decoys], np.int32))


@jax.jit
def adaptive_iters(S, n):
    def one(s, m):
        kt = jnp.asarray(bt.kt, jnp.float32)
        nf = jnp.maximum(jnp.asarray(m).astype(jnp.float32), 1.0)

        def probe(es):
            sig = jnp.exp(-es / kt)
            ff = mc.fold_factors(bt, s, m, jnp.float32, sig)
            return mc.inside(ff, bt, m, jnp.float32, sig)

        def good(ins):
            return (~ins.sat) & (ins.zn > mc.ZLO) & (ins.zn < mc.ZHI) \
                & jnp.isfinite(ins.zn)

        def cond(c):
            es, ins, it = c
            return (it < 8) & ~good(ins)

        def body(c):
            es, ins, it = c
            step = kt * 60.0 / nf
            bad_hi = ins.sat | ~jnp.isfinite(ins.zn) | (ins.zn >= mc.ZHI)
            es2 = jnp.where(bad_hi, es + step,
                            jnp.where(ins.zn > 0,
                                      es + kt * jnp.log(ins.zn) / nf, es - step))
            return (es2, probe(es2), it + 1)

        es = jnp.asarray(mc.SCALE_E0, jnp.float32)
        ins = probe(es)
        es, ins, it = jax.lax.while_loop(cond, body, (es, ins, jnp.int32(0)))
        return it, es, jnp.log(ins.zn)

    return jax.vmap(one)(S, n)


@jax.jit
def mcc_adaptive(S, n):
    return jax.vmap(lambda s, m: mc.base_pair_probs(params, s, m))(S, n)


@jax.jit
def mcc_fixed(S, n):
    def one(s, m):
        _, out = mc.fold(params, s, m, scale_e=mc.SCALE_E0)
        return out.bpp
    return jax.vmap(one)(S, n)


@jax.jit
def cof_adaptive(S1, n1, S2, n2):
    return jax.vmap(lambda a, b, c, d: cofold_hybrid_probs(params, a, c, b, d)
                    )(S1, n1, S2, n2)


@jax.jit
def cof_fixed(S1, n1, S2, n2):
    def one(s1, m1, s2, m2):
        ins, out = cofold(params, s1, s2, m1, m2, scale_e=mc.SCALE_E0)
        Lf1, Lf2 = s1.shape[0], s2.shape[0]
        cols = m1 + jnp.arange(Lf2)[None, :]
        rows = jnp.arange(Lf1)[:, None]
        hp = out.bpp[rows, jnp.clip(cols, 0, Lf1 + Lf2 - 1)]
        return jnp.where((rows < m1) & (jnp.arange(Lf2)[None, :] < m2), hp, 0.0)
    return jax.vmap(one)(S1, n1, S2, n2)


def bench(name, fn, *args):
    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        jax.block_until_ready(o)
    t0 = time.perf_counter(); out = fn(*args); sync(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter(); out = fn(*args); sync(out)
    tr = time.perf_counter() - t0
    print(f"{name:22s} compile+run {tc:7.2f}s   steady {tr*1e3:8.1f} ms", flush=True)
    return out

it, es, lnz = bench("adaptive probe counts", adaptive_iters, S1, n1)
print("  while-loop iters: ", np.bincount(np.asarray(it)), flush=True)
print("  es range:", float(np.min(np.asarray(es))), float(np.max(np.asarray(es))), flush=True)
bench("mccaskill adaptive", mcc_adaptive, S1, n1)
bench("mccaskill fixed-scale", mcc_fixed, S1, n1)
bench("cofold adaptive", cof_adaptive, S1, n1, S2, n2)
bench("cofold fixed-scale", cof_fixed, S1, n1, S2, n2)
