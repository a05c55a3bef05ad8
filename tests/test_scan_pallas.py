"""Pallas column-scan megakernels vs the jnp McCaskill path.

Interpret-mode equivalence: the kernels must reproduce ops.mccaskill's
inside/outside tables and posteriors (same math, same clamping) for random
batched sequences, including padded instances and per-instance adaptive
scaling.  Real-TPU execution is exercised by bench.py / tools/.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops import scan_pallas as sp
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

L = 32
B = 8


def _rand_batch(rng, B=B, L=L, nmin=12):
    seqs = []
    ns = []
    for _ in range(B):
        n = int(rng.integers(nmin, L + 1))
        seqs.append("".join(rng.choice(list("ACGU"), n)))
        ns.append(n)
    S = np.stack([encode(s, L) for s in seqs])
    return jnp.asarray(S), jnp.asarray(np.array(ns, np.int32)), seqs


def _jnp_reference(params, S, n, es):
    """Vmapped jnp inside/outside at fixed scale energies es [B] (f32)."""
    bt = get_boltz(params)

    def one(s, m, e):
        sig = jnp.exp(-e / jnp.float32(bt.kt))
        ff = mc.fold_factors(bt, s, m, jnp.float32, sig)
        ins = mc.inside(ff, bt, m, jnp.float32, sig)
        out = mc.outside(ff, bt, ins, m, jnp.float32, sig)
        return ins, out

    return jax.vmap(one)(S, n, es)


@pytest.fixture(scope="module")
def params():
    return get_default_params()


def test_inside_matches_jnp(params):
    rng = np.random.default_rng(0)
    S, n, _ = _rand_batch(rng)
    es = jnp.full((B,), mc.SCALE_E0, jnp.float32)
    ins_ref, _ = _jnp_reference(params, S, n, es)
    bt = get_boltz(params)
    ins, aux, sig = sp.batch_inside(bt, S, n, es, b_blk=8, interpret=True)
    np.testing.assert_allclose(ins.qb, ins_ref.qb, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm, ins_ref.qm, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm1, ins_ref.qm1, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm2, ins_ref.qm2, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.q1, ins_ref.q1, rtol=2e-5)
    np.testing.assert_allclose(ins.q2, ins_ref.q2, rtol=2e-5)
    np.testing.assert_allclose(ins.zn, ins_ref.zn, rtol=2e-5)


@pytest.mark.smoke
def test_fold_bpp_matches_jnp(params):
    rng = np.random.default_rng(1)
    S, n, _ = _rand_batch(rng)
    res = sp.batch_fold(params, S, n, b_blk=8, interpret=True)
    # reference at the SAME adapted es (the adaptive loops are identical in
    # exact arithmetic but may diverge at the f32 boundary; pin es)
    ins_ref, out_ref = _jnp_reference(params, S, n, res["es"])
    np.testing.assert_allclose(res["bpp"], out_ref.bpp, rtol=5e-5,
                               atol=1e-12)
    np.testing.assert_allclose(res["ob"], out_ref.ob, rtol=5e-5, atol=1e-25)
    # posteriors are probabilities
    assert float(jnp.max(res["bpp"])) <= 1.0 + 1e-4
    assert float(jnp.min(res["bpp"])) >= 0.0


def test_batch_padding_invariance(params):
    """Results for an instance don't depend on its batch neighbors or on
    batch padding to the block size."""
    rng = np.random.default_rng(2)
    S, n, _ = _rand_batch(rng, B=5)           # pads 5 -> 8 internally
    res5 = sp.batch_fold(params, S, n, b_blk=8, interpret=True)
    res1 = sp.batch_fold(params, S[2:3], n[2:3], b_blk=8, interpret=True)
    np.testing.assert_allclose(res5["bpp"][2], res1["bpp"][0], rtol=2e-5,
                               atol=1e-12)
    assert res5["bpp"].shape[0] == 5


def test_streamed_kernels_match_jnp(params):
    """Streamed-state kernel variant (L > 256 path) == jnp reference.

    Exercises the exact code path batch_fold auto-selects for long targets
    (chunked fori_loop contractions + column-stream outputs) at a modest L
    so interpret mode stays fast; tools/tpu_smoke_scan.py re-checks at
    L=1024 on hardware."""
    rng = np.random.default_rng(7)
    Ltest = 64
    S, n, _ = _rand_batch(rng, B=4, L=Ltest, nmin=40)
    es = jnp.full((4,), mc.SCALE_E0, jnp.float32)
    bt = get_boltz(params)
    ins_ref, out_ref = _jnp_reference(params, S, n, es)
    ins, aux, sig = sp.batch_inside(bt, S, n, es, b_blk=4, interpret=True,
                                    streamed=True)
    np.testing.assert_allclose(ins.qb, ins_ref.qb, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm, ins_ref.qm, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm1, ins_ref.qm1, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.qm2, ins_ref.qm2, rtol=2e-5, atol=1e-30)
    np.testing.assert_allclose(ins.q1, ins_ref.q1, rtol=2e-5)
    np.testing.assert_allclose(ins.q2, ins_ref.q2, rtol=2e-5)
    # streamed outside pass
    q1pad = jnp.concatenate([jnp.ones((4, 1), jnp.float32),
                             ins.q1[:, :-1]], axis=1)
    fcbl = tuple(getattr(aux["ffc"], f) for f in sp.FACTOR_FIELDS)
    ob_c = sp.outside_pallas_streamed(
        fcbl, aux["qmT"], aux["qm1_c"], q1pad, ins.q2, aux["w2k"],
        aux["bulge_k"], sig[:, None], aux["pows"], Ltest, 4, 4,
        interpret=True)
    ob = sp._from_cbl(ob_c)
    np.testing.assert_allclose(ob, out_ref.ob, rtol=5e-5, atol=1e-25)


def test_streamed_batch_chunking(params):
    """b_blk < 8 with B > b_blk slices the batch into per-call chunks
    (Mosaic block-shape rule); results must match the unchunked run."""
    rng = np.random.default_rng(9)
    S, n, _ = _rand_batch(rng, B=4, L=64, nmin=40)
    es = jnp.full((4,), mc.SCALE_E0, jnp.float32)
    bt = get_boltz(params)
    ins_c, _, _ = sp.batch_inside(bt, S, n, es, b_blk=2, interpret=True,
                                  streamed=True)
    ins_f, _, _ = sp.batch_inside(bt, S, n, es, b_blk=4, interpret=True,
                                  streamed=True)
    np.testing.assert_allclose(ins_c.qb, ins_f.qb, rtol=1e-6)
    np.testing.assert_allclose(ins_c.q1, ins_f.q1, rtol=1e-6)


def test_streamed_long_dispatch(params):
    """batch_fold at L=288 (> the resident-kernel cap) runs the streamed
    path end-to-end and matches the jnp posteriors."""
    rng = np.random.default_rng(8)
    S, n, _ = _rand_batch(rng, B=2, L=288, nmin=260)
    res = sp.batch_fold(params, S, n, interpret=True)
    ins_ref, out_ref = _jnp_reference(params, S, n, res["es"])
    np.testing.assert_allclose(res["bpp"], out_ref.bpp, rtol=5e-5,
                               atol=1e-12)
    assert float(jnp.max(res["bpp"])) <= 1.0 + 1e-4


def test_accessibility_from_batch_fold(params):
    """unpaired_probs driven by the kernel tables == the jnp accessibility."""
    from ractip_tpu.ops.accessibility import accessibility, unpaired_probs
    rng = np.random.default_rng(3)
    S, n, _ = _rand_batch(rng, B=4)
    res = sp.batch_fold(params, S, n, b_blk=4, interpret=True)
    bt = get_boltz(params)
    max_w = 5

    def one(ff, ins, ob, sig):
        out = mc.OutsideState(ob=ob, bpp=jnp.zeros_like(ob))
        return unpaired_probs(ff, bt, ins, out, None, max_w, jnp.float32,
                              sig)

    # vmapped unpaired_probs needs n per instance
    pu = jax.vmap(lambda ff, ins, ob, sig, m: unpaired_probs(
        ff, bt, ins, mc.OutsideState(ob=ob, bpp=jnp.zeros_like(ob)),
        m, max_w, jnp.float32, sig))(res["ff"], res["ins"], res["ob"],
                                     res["sig"], n)
    for b in range(4):
        ref = accessibility(params, S[b], n[b], max_w, jnp.float32,
                            scale_e=res["es"][b])
        np.testing.assert_allclose(pu[b], ref, rtol=1e-4, atol=1e-8)
