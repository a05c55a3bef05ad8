#!/usr/bin/env python
"""DIS cross-cut posterior sensitivity probe (follow-up to audit_dis.py).

The symmetry hypothesis is disproven (audit_dis.py: flipping DIS needs a
>=2.1 kcal/mol model shift at hp(10,22)/hp(11,21)).  The remaining candidate
terms in the cut-exposed exterior-loop model (reference: Vienna co_pf_fold,
src/ractip.cpp:442-453) are the d2 dangle and terminal-AU conventions on
cut-spanning stems (our `fe`/`fcx` factors, ops/cofold.py:172-180).  This
probe recomputes the joint-ensemble cross-cut posteriors under ablations of
those terms and reports how far each moves the two decisive entries -- i.e.
whether the candidate owns enough free energy to explain the deviation.
"""
import numpy as np
import jax.numpy as jnp

import ractip_tpu.ops.cofold as co
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
_DATA = _ddd()

fa = load_fasta(_DATA + "/DIS.fa")[0]
S = jnp.asarray(encode(fa.seq))
n = len(fa.seq)
params = get_default_params()
orig_co_factors = co.co_factors


def make_variant(no_ext_dangle=False, no_fcx_dangle=False, no_fcx_tau=False):
    def co_factors_variant(bt, S, nn, cut, dtype=jnp.float32, sigma=None,
                           allow=None):
        ff = orig_co_factors(bt, S, nn, cut, dtype, sigma, allow)
        import jax.numpy as j
        f = lambda a: j.asarray(a, dtype)
        sig = j.asarray(bt.sigma if sigma is None else sigma, dtype)
        L = ff.fe.shape[0]
        I, J = j.arange(L)[:, None], j.arange(L)[None, :]
        from ractip_tpu.constants import PAIR_TYPE, RTYPE
        pair_tbl = j.asarray(np.array(PAIR_TYPE, np.int32))
        t = pair_tbl[S[:, None], S[None, :]]
        rt = j.asarray(np.array(RTYPE, np.int32))[t]
        tv = ff.fe > 0
        sv = ff.fcx > 0
        fe, fcx = ff.fe, ff.fcx
        if no_ext_dangle:
            fe = j.where(tv, f(bt.term_au)[t], 0.0)
        if no_fcx_dangle:
            fcx = j.where(sv, f(bt.term_au)[rt] * sig ** 2, 0.0)
        if no_fcx_tau:
            fcx = j.where(sv, fcx / j.maximum(f(bt.term_au)[rt], 1e-30), fcx)
        return ff._replace(fe=fe, fcx=fcx)

    return co_factors_variant


def hp_variant(**kw):
    co.co_factors = make_variant(**kw) if kw else orig_co_factors
    try:
        hp = np.asarray(co.cofold_hybrid_probs(
            params, S, S, jnp.int32(n), jnp.int32(n)))
    finally:
        co.co_factors = orig_co_factors
    return hp


KEY = [(10, 22), (11, 21), (14, 19)]  # decisive entries + a golden kissing pair
base = hp_variant()
print("variant                          hp(10,22)  hp(11,21)  hp(14,19)   "
      "dG_shift(10,22) kcal")
for name, kw in [
        ("baseline (our cofold model)", {}),
        ("no exterior-stem dangles (fe)", dict(no_ext_dangle=True)),
        ("no spanning-closer dangles (fcx)", dict(no_fcx_dangle=True)),
        ("no spanning-closer terminalAU", dict(no_fcx_tau=True)),
        ("no fe AND no fcx dangles", dict(no_ext_dangle=True,
                                          no_fcx_dangle=True))]:
    hp = hp_variant(**kw) if kw else base
    p0 = hp[KEY[0]]
    odds0 = base[KEY[0]] / (1 - base[KEY[0]])
    odds = max(p0, 1e-12) / max(1 - p0, 1e-12)
    dg = 0.6163 * np.log(odds0 / odds)
    print(f"{name:32s}  {hp[KEY[0]]:.4f}     {hp[KEY[1]]:.4f}     "
          f"{hp[KEY[2]]:.4f}      {dg:+.2f}")
print("\nrequired to flip DIS: hp(10,22) < 0.76  (dG shift >= +2.14)")
