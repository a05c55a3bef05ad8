#!/usr/bin/env python
"""Resident vs streamed vs jnp on TPU at L=256 (all three paths valid)."""
import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

params = get_default_params()
bt = get_boltz(params)
rng = np.random.default_rng(0)
L, B, n = 256, 2, 250
seqs = ["".join(rng.choice(list("ACGU"), n)) for _ in range(B)]
S = jnp.asarray(np.stack([encode(s, L) for s in seqs]))
nv = jnp.full((B,), n, jnp.int32)

res_r = jax.jit(lambda S, n: sp.batch_fold(params, S, n, b_blk=8))(S, nv)
es = res_r["es"]
print("adapted es:", np.asarray(es), "sig:", np.asarray(res_r["sig"]),
      flush=True)

ins_r, aux_r, _ = sp.batch_inside(bt, S, nv, es, b_blk=8, streamed=False)
ins_s, aux_s, _ = sp.batch_inside(bt, S, nv, es, b_blk=8, streamed=True)

def one(s, m, e):
    sg = jnp.exp(-e / jnp.float32(bt.kt))
    ff = mc.fold_factors(bt, s, m, jnp.float32, sg)
    return mc.inside(ff, bt, m, jnp.float32, sg)

ins_j = jax.jit(jax.vmap(one))(S, nv, es)

for f in ("qb", "qm", "qm1", "q1", "zn", "sat"):
    r = np.asarray(getattr(ins_r, f), np.float64)
    st = np.asarray(getattr(ins_s, f), np.float64)
    jj = np.asarray(getattr(ins_j, f), np.float64)
    def rel(a, b):
        m = np.abs(b) > 1e-25
        return (np.abs(a - b) / np.maximum(np.abs(b), 1e-30) * m).max()
    print(f"{f:4s}: resident-vs-jnp {rel(r, jj):.3e}   "
          f"streamed-vs-jnp {rel(st, jj):.3e}   "
          f"streamed-vs-resident {rel(st, r):.3e}", flush=True)
print("max qb:", float(np.asarray(ins_j.qb).max()),
      " max qm:", float(np.asarray(ins_j.qm).max()),
      " zn:", np.asarray(ins_j.zn), flush=True)
