#!/usr/bin/env python
"""Which part of fold_factors costs 363ms? Gathers vs elementwise."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.constants import PAIR_TYPE
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
sig = jnp.full((B,), 0.74, jnp.float32)


def timeit(label, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {best*1e3:8.1f} ms", flush=True)


pair_tbl = jnp.asarray(np.array(PAIR_TYPE, np.int32))
f32 = lambda a: jnp.asarray(a, jnp.float32)


@jax.jit
def just_int22(S, sig):
    def one(s, sg):
        Lc = s.shape[0]
        t = pair_tbl[s[:, None], s[None, :]]
        def sgv(off):
            idx = jnp.arange(Lc) + off
            ok = (idx >= 0) & (idx < Lc)
            return jnp.where(ok, s[jnp.clip(idx, 0, Lc - 1)], 0)
        tr = pair_tbl[jnp.broadcast_to(sgv(-3)[None, :], (Lc, Lc)),
                      jnp.broadcast_to(sgv(3)[:, None], (Lc, Lc))]
        return f32(bt.int22)[t, tr, sgv(1)[:, None], sgv(2)[:, None],
                             sgv(-2)[None, :], sgv(-1)[None, :]] * sg ** 6
    return jax.vmap(one)(S, sig)


@jax.jit
def just_int21x2(S, sig):
    def one(s, sg):
        Lc = s.shape[0]
        t = pair_tbl[s[:, None], s[None, :]]
        def sgv(off):
            idx = jnp.arange(Lc) + off
            ok = (idx >= 0) & (idx < Lc)
            return jnp.where(ok, s[jnp.clip(idx, 0, Lc - 1)], 0)
        tr = pair_tbl[jnp.broadcast_to(sgv(-3)[None, :], (Lc, Lc)),
                      jnp.broadcast_to(sgv(2)[:, None], (Lc, Lc))]
        a = f32(bt.int21)[t, tr, sgv(1)[:, None], sgv(-2)[None, :],
                          sgv(-1)[None, :]]
        b = f32(bt.int21)[tr, t, sgv(-1)[None, :], sgv(1)[:, None],
                          sgv(2)[:, None]]
        return a * b * sg ** 5
    return jax.vmap(one)(S, sig)


@jax.jit
def just_mismatches(S, sig):
    def one(s, sg):
        Lc = s.shape[0]
        t = pair_tbl[s[:, None], s[None, :]]
        def sgv(off):
            idx = jnp.arange(Lc) + off
            ok = (idx >= 0) & (idx < Lc)
            return jnp.where(ok, s[jnp.clip(idx, 0, Lc - 1)], 0)
        mh = f32(bt.mismatch_h)[t, sgv(1)[:, None], sgv(-1)[None, :]]
        mi = f32(bt.mismatch_i)[t, sgv(1)[:, None], sgv(-1)[None, :]]
        return mh * mi
    return jax.vmap(one)(S, sig)


@jax.jit
def just_stack(S, sig):
    def one(s, sg):
        Lc = s.shape[0]
        t = pair_tbl[s[:, None], s[None, :]]
        def sgv(off):
            idx = jnp.arange(Lc) + off
            ok = (idx >= 0) & (idx < Lc)
            return jnp.where(ok, s[jnp.clip(idx, 0, Lc - 1)], 0)
        tr = pair_tbl[jnp.broadcast_to(sgv(-1)[None, :], (Lc, Lc)),
                      jnp.broadcast_to(sgv(1)[:, None], (Lc, Lc))]
        return f32(bt.stack)[t, tr] * sg ** 2
    return jax.vmap(one)(S, sig)


@jax.jit
def full_factors(S, n, sig):
    return sp._batch_factors(bt, S, n, sig)


timeit("full fold_factors", full_factors, S, n, sig)
timeit("int22 alone", just_int22, S, sig)
timeit("int21 x2 alone", just_int21x2, S, sig)
timeit("mismatch_h+i alone", just_mismatches, S, sig)
timeit("stack alone", just_stack, S, sig)
