"""Pallas duplex sweep vs the jnp reference sweep (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.ops import duplex as dx
from ractip_tpu.ops.duplex_pallas import sweep_pallas
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

S1_STR = "CUCGGCUUGCUGAGGUGCACACAGCAAGAGGCGAG"
S2_STR = "GGAUACUCACGACGCGGUUCA"


def _pair(L1=48, L2=32):
    S1 = jnp.asarray(encode(S1_STR, L1))
    S2 = jnp.asarray(encode(S2_STR, L2))
    return S1, S2, len(S1_STR), len(S2_STR)


@pytest.mark.parametrize("reverse", [False, True])
def test_sweep_matches_jnp(reverse):
    params = get_default_params()
    bt = get_boltz(params)
    S1, S2, n1, n2 = _pair()
    mk = dx.duplex_factors_bk if reverse else dx.duplex_factors_fw
    ff = mk(bt, S1, S2, n1, n2, jnp.float32)

    M0, l0 = dx._sweep(ff, bt, jnp.float32, reverse=reverse)
    M1, l1 = sweep_pallas(ff, bt, jnp.float32, reverse=reverse, interpret=True)

    # compare unscaled log values where the chain sum is nonzero
    log0 = np.where(M0 > 0, np.log(np.maximum(M0, 1e-300)) + np.asarray(l0)[:, None], -1e9)
    log1 = np.where(M1 > 0, np.log(np.maximum(M1, 1e-300)) + np.asarray(l1)[:, None], -1e9)
    mask = (np.asarray(M0) > 0) | (np.asarray(M1) > 0)
    assert ((np.asarray(M0) > 0) == (np.asarray(M1) > 0)).all()
    np.testing.assert_allclose(log0[mask], log1[mask], rtol=0, atol=5e-4)


def test_duplex_posteriors_match_end_to_end():
    params = get_default_params()
    S1, S2, n1, n2 = _pair()
    r_jnp = dx.duplex(params, S1, S2, n1, n2, use_pallas=False)
    r_pl = dx.duplex(params, S1, S2, n1, n2, use_pallas=True,
                     pallas_interpret=True)
    np.testing.assert_allclose(float(r_pl.log_zd), float(r_jnp.log_zd),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_pl.pr), np.asarray(r_jnp.pr),
                               atol=2e-5)


def test_duplex_pallas_under_vmap():
    params = get_default_params()
    S1, S2, n1, n2 = _pair()
    S1b = jnp.stack([S1, jnp.roll(S1, 3)])
    S2b = jnp.stack([S2, S2])
    n1b = jnp.asarray([n1, n1], jnp.int32)
    n2b = jnp.asarray([n2, n2], jnp.int32)

    def one(use_pallas):
        def f(a, b, c, d):
            r = dx.duplex(params, a, c, b, d, use_pallas=use_pallas,
                          pallas_interpret=use_pallas)
            return r.pr, r.log_zd
        return jax.vmap(f)(S1b, n1b, S2b, n2b)

    pr0, lz0 = one(False)
    pr1, lz1 = one(True)
    np.testing.assert_allclose(np.asarray(lz1), np.asarray(lz0),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pr1), np.asarray(pr0), atol=2e-5)


def test_duplex_pallas_long_target():
    """Row-streamed factor blocks: the kernel no longer holds whole factor
    matrices in VMEM, so long accessibility-mode targets (L2 >> 512) work.
    Interpret-mode check at L2=2048 against the jnp sweep."""
    params = get_default_params()
    rng = np.random.default_rng(7)
    s1 = "".join(rng.choice(list("ACGU"), 40))
    s2 = "".join(rng.choice(list("ACGU"), 1990))
    from ractip_tpu.ops.seq import bucket_length, encode
    L1, L2 = bucket_length(len(s1)), bucket_length(len(s2))
    assert L2 >= 2016
    S1 = jnp.asarray(encode(s1, L1))
    S2 = jnp.asarray(encode(s2, L2))
    n1, n2 = jnp.int32(len(s1)), jnp.int32(len(s2))
    r0 = dx.duplex(params, S1, S2, n1, n2, use_pallas=False)
    r1 = dx.duplex(params, S1, S2, n1, n2, use_pallas=True,
                   pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(r1.log_zd), np.asarray(r0.log_zd),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.pr), np.asarray(r0.pr),
                               atol=2e-5)
