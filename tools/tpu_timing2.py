#!/usr/bin/env python
"""TPU timing of the full Pallas DP stack at bench shapes (scalar outputs)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.ops import cofold_pallas as cp
from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

params = get_default_params()
bt = get_boltz(params)
rng = np.random.default_rng(0)
B, L = 128, 96
seqs = ["".join(rng.choice(list("ACGU"), 70)) for _ in range(2 * B)]
S = jnp.asarray(np.stack([encode(s, L) for s in seqs[:B]]))
S2 = jnp.asarray(np.stack([encode(s, L) for s in seqs[B:]]))
n = jnp.asarray(np.full(B, 70, np.int32))


def timeit(label, fn, *args):
    t0 = time.perf_counter()
    float(np.asarray(fn(*args)))
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} compile {tc:6.1f}s   steady {best*1e3:8.1f} ms",
          flush=True)


sig = jnp.full((B,), 0.74, jnp.float32)
timeit("factors_mm dual (mcc)", jax.jit(
    lambda S, n, sig: sum(jnp.sum(t) for t in
                          sp._batch_factors(bt, S, n, sig))
    + sum(jnp.sum(t) for t in
          sp._batch_factors(bt, S, n, sig, transposed=True))), S, n, sig)

for b in (8, 32):
    timeit(f"batch_fold b{b}", jax.jit(
        lambda S, n, b=b: jnp.sum(sp.batch_fold(params, S, n, b_blk=b)["bpp"])),
        S, n)

for b in (8, 32):
    timeit(f"batch_cofold b{b}", jax.jit(
        lambda S, S2, n, b=b: jnp.sum(
            cp.batch_cofold(params, S, S2, n, n, b_blk=b)["hp"])), S, S2, n)

# correctness on TPU: kernel vs jnp path at adapted es (small shape)
Bs, Ls = 8, 32
Ss = jnp.asarray(np.stack([encode("".join(rng.choice(list("ACGU"), 24)), Ls)
                           for _ in range(Bs)]))
ns = jnp.asarray(np.full(Bs, 24, np.int32))
res = jax.jit(lambda S, n: sp.batch_fold(params, S, n, b_blk=8))(Ss, ns)
from ractip_tpu.ops import mccaskill as mc


def one_ref(s, m, e):
    sg = jnp.exp(-e / jnp.float32(bt.kt))
    ff = mc.fold_factors(bt, s, m, jnp.float32, sg)
    ins = mc.inside(ff, bt, m, jnp.float32, sg)
    return mc.outside(ff, bt, ins, m, jnp.float32, sg).bpp

bpp_r = jax.jit(jax.vmap(one_ref))(Ss, ns, res["es"])
err = float(jnp.max(jnp.abs(res["bpp"] - bpp_r)))
print(f"TPU mcc correctness: {err:.2e}", flush=True)

res2 = jax.jit(lambda a, b, m: cp.batch_cofold(params, a, b, m, m, b_blk=8)
               )(Ss, Ss, ns)
from ractip_tpu.ops.cofold import cofold_hybrid_probs
hp_r = jax.jit(jax.vmap(lambda a, b, m1, m2: cofold_hybrid_probs(
    params, a, b, m1, m2, jnp.float32)))(Ss, Ss, ns, ns)
err2 = float(jnp.max(jnp.abs(res2["hp"] - hp_r)))
print(f"TPU cofold correctness: {err2:.2e}", flush=True)
