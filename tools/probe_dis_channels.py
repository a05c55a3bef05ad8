#!/usr/bin/env python
"""DIS x DIS: decompose the inside mass qb(i,j) of the deviating cross-cut
pairs by recursion case (hairpin impossible / stack / small interiors /
generic interior / bulge / multiloop / exposed-cut clamp), identifying WHICH
channel carries the posterior mass that Vienna's co_pf must be scoring
differently (VERDICT round-4 item 2)."""
import numpy as np
import jax
import jax.numpy as jnp

from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.ops import cofold as co
from ractip_tpu.ops.mccaskill import _sig_kernels, W
from ractip_tpu.constants import MAXLOOP
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

_DATA = _ddd()
fa = load_fasta(_DATA + "/DIS.fa")[0]
params = get_default_params()
bt = get_boltz(params)
n1 = n2 = len(fa.seq)
L1 = L2 = bucket_length(n1)
S1 = S2 = jnp.asarray(encode(fa.seq, L1))

ins, out = co.cofold(params, S1, S2, jnp.int32(n1), jnp.int32(n2),
                     dtype=jnp.float64)
c = n1
L = L1 + L2
idx = jnp.arange(L)
S2r = jnp.roll(jnp.concatenate([S2, jnp.zeros((L1,), S2.dtype)]), n1)
S = jnp.where(idx < n1, jnp.concatenate([S1, jnp.zeros((L2,), S1.dtype)]), S2r)
# recover sigma from the converged scale: cofold returns no es; recompute via
# zn and adaptive... instead re-run with scale_e fixed from a probe: easier to
# grab from a second cofold call exposing es is invasive -- reconstruct sigma
# by matching: run co_factors with sigma from params' default path
# (cofold uses adaptive es; we re-run inside at the SAME es by bisection-free
# trick: call cofold internals directly)
import ractip_tpu.ops.cofold as C

# reproduce the adaptive loop to get es (same code path, f64)
kt = float(bt.kt)
dtype = jnp.float64

def probe(es):
    sig = jnp.exp(-jnp.asarray(es, dtype) / kt)
    ff = C.co_factors(bt, S, jnp.int32(n1 + n2), jnp.int32(c), dtype, sig)
    return C.co_inside(ff, bt, jnp.int32(n1 + n2), jnp.int32(c), dtype, sig), ff, sig

from ractip_tpu.ops.mccaskill import SCALE_E0, ZLO, ZHI
es = float(SCALE_E0)
st, ff, sig = probe(es)
for _ in range(8):
    zn = float(st.zn)
    good = (not bool(st.sat)) and ZLO < zn < ZHI and np.isfinite(zn)
    if good:
        break
    if bool(st.sat) or not np.isfinite(zn) or zn >= ZHI:
        es = es + kt * 60.0 / (n1 + n2)
    elif zn > 0:
        es = es + kt * np.log(zn) / (n1 + n2)
    else:
        es = es - kt * 60.0 / (n1 + n2)
    st, ff, sig = probe(es)

qb = np.asarray(st.qb); qm = np.asarray(st.qm); qm1 = np.asarray(st.qm1)
qx = np.asarray(st.qx)
ffn = jax.tree.map(np.asarray, ff)
sigv = float(sig)
_, smlb, w2k, bulge_k = (np.asarray(t) for t in _sig_kernels(bt, sig, dtype))

def decompose(i, j):
    cases = {}
    cases["hairpin"] = ffn.fhn[i, j]
    cases["stack"] = ffn.pstk[i, j] * qb[i + 1, j - 1]
    cases["int11"] = ffn.p11[i, j] * qb[i + 2, j - 2]
    cases["int21"] = ffn.p21a[i, j] * qb[i + 2, j - 3] \
        + ffn.p21b[i, j] * qb[i + 3, j - 2]
    cases["int22"] = ffn.p22[i, j] * qb[i + 3, j - 3]
    cases["bulge1"] = ffn.pb15[i, j] * qb[i + 2, j - 1] \
        + ffn.pb13[i, j] * qb[i + 1, j - 2]
    gen = 0.0
    for u1 in range(1, MAXLOOP):
        for u2 in range(1, MAXLOOP):
            if u1 + u2 + 2 > W:
                continue
            k, l = i + u1 + 1, j - u2 - 1
            if k < l and not (i < c <= i + u1 + 1 - 1 + 1) and qb[k, l] > 0:
                # masks handled by minn being nonzero only for pairs
                if (i < c <= k) or (l - 1 < c <= j):  # stretch crosses cut
                    continue
                if u1 + u2 >= 2 and not (u1 == u2 == 1) \
                   and not (u1 == 1 and u2 == 2) and not (u1 == 2 and u2 == 1) \
                   and not (u1 == u2 == 2):
                    gen += ffn.mout[i, j] * ffn.minn[k, l] * qb[k, l] \
                        * w2k[u1 - 1, u2 - 1] if u1 - 1 < w2k.shape[0] and u2 - 1 < w2k.shape[1] else 0.0
    cases["gen_int(approx)"] = gen
    blg = 0.0
    for m in range(2, MAXLOOP + 1):
        k, l = i + m + 1, j - 1
        if k < l and not (i < c <= k) and qb[k, l] > 0:
            blg += ffn.tau[i, j] * bulge_k[m] * ffn.taur[k, l] * qb[k, l]
        k, l = i + 1, j - m - 1
        if k < l and not (l < c <= j) and qb[k, l] > 0:
            blg += ffn.tau[i, j] * bulge_k[m] * ffn.taur[k, l] * qb[k, l]
    cases["bulge>1"] = blg
    # multiloop: fmc * sig^2 * qm2(i+1, j-1), qm2(a, b) = sum_m qm(a, m-1)*qm1(m, b)
    qm2 = sum(qm[i + 1, m - 1] * qm1[m, j - 1]
              for m in range(i + 2, j - 1) if m != c)
    cases["multiloop"] = (ffn.fmc[i, j] * sigv ** 2 * qm2) if j != c else 0.0
    qxA = qx[i + 1, c - 1] if i + 1 < c else (1.0 if i + 1 == c else 0.0)
    qxB = qx[c, j - 1] if j - 1 >= c else 1.0
    cases["exposed_cut"] = ffn.fcx[i, j] * qxA * qxB
    tot = qb[i, j]
    print(f"\npair ({i},{j - c}') qb={tot:.3e}  (sum cases="
          f"{sum(cases.values()):.3e})")
    for k2, v in sorted(cases.items(), key=lambda kv: -kv[1]):
        if v > 0:
            print(f"  {k2:16s} {v:12.3e}  {v / tot * 100:6.2f}%")

for (i, j2) in ((10, 22), (11, 21), (16, 17), (14, 19)):
    decompose(i, c + j2)
