#!/usr/bin/env python
"""DIS x DIS ensemble composition: expected number of cross pairs and the
posterior mass per duplex register d = i + j' (full-duplex hypothesis)."""
import numpy as np
import jax.numpy as jnp

from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params

_DATA = _ddd()
fa = load_fasta(_DATA + "/DIS.fa")[0]
params = get_default_params()
n = len(fa.seq)
L = bucket_length(n)
S = jnp.asarray(encode(fa.seq, L))
for delta in (None, 0.5):
    hp = np.asarray(cofold_hybrid_probs(params, S, S, jnp.int32(n),
                                        jnp.int32(n),
                                        span_loop_penalty=delta))[:n, :n]
    print(f"delta={delta}: E[#cross pairs] = {hp.sum():.2f}")
    reg = np.zeros(2 * n - 1)
    for i in range(n):
        for j in range(n):
            reg[i + j] += hp[i, j]
    top = np.argsort(reg)[::-1][:6]
    for d in top:
        print(f"   register i+j'={d:3d}: mass {reg[d]:6.2f}")
    # largest individual entries
    fl = np.argsort(hp.ravel())[::-1][:12]
    print("   top pairs:", [(k // n, k % n, round(float(hp.ravel()[k]), 3))
                            for k in fl[:8]])
