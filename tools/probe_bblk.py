#!/usr/bin/env python
"""Measure batch_fold / batch_cofold wall time vs b_blk at the bench shape.
Forces a device->host transfer of the result and rotates inputs per rep."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops import cofold_pallas as cp
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params

params = get_default_params()
rng = np.random.default_rng(1)
B, n, L = 128, 70, 96

def mk():
    seqs = ["".join(rng.choice(list("ACGU"), n)) for _ in range(B)]
    return jnp.asarray(np.stack([encode(s, L) for s in seqs]))

m = jnp.full(B, n, jnp.int32)
Ss = [mk() for _ in range(4)]
S2s = [mk() for _ in range(4)]

def timeit(fn, argsets, rep=3):
    np.asarray(fn(*argsets[0]))
    ts = []
    for i in range(rep):
        a = argsets[(i + 1) % len(argsets)]
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)

for b_blk in (8, 16, 32):
    try:
        fold = jax.jit(lambda S, m, bb=b_blk: jnp.sum(
            sp.batch_fold(params, S, m, b_blk=bb)["bpp"], axis=(1, 2)))
        t = timeit(fold, [(S, m) for S in Ss])
        print(f"fold  b_blk={b_blk}: {t*1e3:7.1f} ms  "
              f"({B*n**3/2/t/1e9:.3f} gcups)")
    except Exception as e:
        print(f"fold  b_blk={b_blk}: FAIL {type(e).__name__}: {str(e)[:150]}")
for b_blk in (8,):
    try:
        cof = jax.jit(lambda a, b, m1, m2, bb=b_blk: jnp.sum(
            cp.batch_cofold(params, a, b, m1, m2, b_blk=bb)["hp"],
            axis=(1, 2)))
        t = timeit(cof, [(S, S2, m, m) for S, S2 in zip(Ss, S2s)])
        print(f"cofold b_blk={b_blk}: {t*1e3:7.1f} ms  "
              f"({B*(2*n)**3/2/t/1e9:.3f} gcups)")
    except Exception as e:
        print(f"cofold b_blk={b_blk}: FAIL {type(e).__name__}: {str(e)[:150]}")
