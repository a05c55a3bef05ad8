#!/usr/bin/env python
"""Streamed-state megakernel smoke + timing on real TPU.

1. Equivalence at L=384 (streamed) vs the resident kernel at the same L is
   impossible (resident caps at 256), so we check streamed-vs-jnp at L=320
   on-device, then time the streamed path at mRNA scale (L=1024) and a long
   cofold (L1+L2=576) -- the workloads of the reference's accessibility mode
   (src/ractip.cpp:308-382, multi-knt targets).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ractip_tpu.ops import cofold_pallas as cp
from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

params = get_default_params()
bt = get_boltz(params)
rng = np.random.default_rng(0)


def rand_batch(B, L, n):
    seqs = ["".join(rng.choice(list("ACGU"), n)) for _ in range(B)]
    S = jnp.asarray(np.stack([encode(s, L) for s in seqs]))
    return S, jnp.full((B,), n, jnp.int32)


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return out, dt


# --- correctness: streamed vs jnp at L=320 on-device ---
S, n = rand_batch(2, 320, 300)
res = jax.jit(lambda S, n: sp.batch_fold(params, S, n))(S, n)
es = res["es"]


def one(s, m, e):
    sig = jnp.exp(-e / jnp.float32(bt.kt))
    ff = mc.fold_factors(bt, s, m, jnp.float32, sig)
    ins = mc.inside(ff, bt, m, jnp.float32, sig)
    out = mc.outside(ff, bt, ins, m, jnp.float32, sig)
    return out.bpp


bpp_ref = jax.jit(jax.vmap(one))(S, n, es)
err = float(jnp.max(jnp.abs(res["bpp"] - bpp_ref)))
print(f"L=320 streamed-vs-jnp max |dbpp| = {err:.2e}", flush=True)
# f32 accumulation-order drift between the kernel and the XLA scans grows
# with n (the scaled-linear zn drifts while posteriors, being ratios,
# stay put); tools/tpu_streamed_diag.py shows the resident kernel has the
# same property at L=256 and that streamed == resident bit-exactly on the
# exterior chain.  2e-3 is far below every decision threshold (th_hy=0.1).
assert err < 5e-3, err

# --- timing: mRNA-scale fold ---
for L, B in ((512, 4), (1024, 2)):
    S, n = rand_batch(B, L, L - 8)
    fn = jax.jit(lambda S, n: sp.batch_fold(params, S, n)["bpp"])
    out, dt = timeit(f"batch_fold L={L} B={B}", fn, S, n)
    cells = 2 * B * L ** 3 / 3
    print(f"  -> {cells / dt / 1e9:.2f} G cells/s/chip", flush=True)
    assert bool(jnp.isfinite(out).all())

# --- timing: long cofold ---
S1, n1 = rand_batch(2, 288, 280)
S2, n2 = rand_batch(2, 288, 280)
fn = jax.jit(lambda a, b, m1, m2: cp.batch_cofold(params, a, b, m1, m2)["hp"])
out, dt = timeit("batch_cofold L1+L2=576 B=2", fn, S1, S2, n1, n2)
assert bool(jnp.isfinite(out).all())
print("OK", flush=True)
