#!/usr/bin/env python
"""True device times: every jit returns a scalar (no big tunnel transfers)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops import mccaskill as mc
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
sig = jnp.exp(-es / jnp.float32(bt.kt))


def timeit(label, fn, *args):
    out = fn(*args)
    float(np.asarray(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:32s} {best*1e3:8.1f} ms", flush=True)


timeit("null (dispatch+sync floor)", jax.jit(lambda S: jnp.sum(S)), S)
timeit("factors sum", jax.jit(
    lambda S, n, sig: sum(jnp.sum(t) for t in sp._batch_factors(bt, S, n, sig))),
    S, n, sig)


def inside_sum(b_blk):
    @jax.jit
    def f(S, n, sig):
        ff = sp._batch_factors(bt, S, n, sig)
        w2k, bulge_k, pows = sp._sig_tables(bt, sig)
        fcbl = tuple(sp._to_cbl(getattr(ff, fld)) for fld in sp.FACTOR_FIELDS)
        outs = sp.inside_pallas_streamed(fcbl, w2k, bulge_k, sig[:, None],
                                         pows, L, B, b_blk, False,
                                         unroll=True)
        return sum(jnp.sum(t) for t in outs)
    return f

for b in (8, 32, 64):
    timeit(f"factors+transpose+inside b{b}", inside_sum(b), S, n, sig)

timeit("batch_fold sum b32", jax.jit(
    lambda S, n: jnp.sum(sp.batch_fold(params, S, n, b_blk=32)["bpp"])), S, n)

timeit("jnp mccaskill bpp sum", jax.jit(
    lambda S, n: jnp.sum(jax.vmap(
        lambda s, m: mc.base_pair_probs(params, s, m))(S, n))), S, n)
