"""Bilinear-matmul factor matrices vs the gather-based reference builders.

fold_factors_mm / co_factors_mm must reproduce ops.mccaskill.fold_factors /
ops.cofold.co_factors EXACTLY (same tables, same masks) in both orientations,
including padded buffers, boundary dangles, tetraloop bonuses, and the
cofold cut masks."""

import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.ops import factors_mm as fm
from ractip_tpu.ops.cofold import co_factors
from ractip_tpu.ops.mccaskill import fold_factors
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params


@pytest.fixture(scope="module")
def bt():
    return get_boltz(get_default_params())


def _cases(rng, L=24, k=6):
    for _ in range(k):
        n = int(rng.integers(10, L + 1))
        seq = "".join(rng.choice(list("ACGU"), n))
        # include a tetraloop-prone hairpin sometimes
        if rng.random() < 0.5 and n >= 10:
            seq = seq[:2] + "GGGGAC" + seq[8:]
        yield jnp.asarray(encode(seq, L)), jnp.int32(n)


def test_fold_factors_mm_exact(bt):
    rng = np.random.default_rng(0)
    for S, n in _cases(rng):
        sig = jnp.float32(0.741)
        ref = fold_factors(bt, S, n, jnp.float32, sig)
        got = fm.fold_factors_mm(bt, S, n, sig)
        gotT = fm.fold_factors_mm(bt, S, n, sig, transposed=True)
        for f in ref._fields:
            np.testing.assert_allclose(
                getattr(got, f), getattr(ref, f), rtol=1e-6, atol=1e-30,
                err_msg=f)
            np.testing.assert_allclose(
                getattr(gotT, f), getattr(ref, f).T, rtol=1e-6, atol=1e-30,
                err_msg=f + ".T")


def test_fold_factors_mm_allow_mask(bt):
    rng = np.random.default_rng(1)
    S, n = next(iter(_cases(rng)))
    L = S.shape[0]
    allow = rng.random((L, L)) > 0.3
    allow = np.asarray(allow & allow.T)
    sig = jnp.float32(0.7)
    ref = fold_factors(bt, S, n, jnp.float32, sig, allow=jnp.asarray(allow))
    got = fm.fold_factors_mm(bt, S, n, sig, allow=allow)
    for f in ref._fields:
        np.testing.assert_allclose(getattr(got, f), getattr(ref, f),
                                   rtol=1e-6, atol=1e-30, err_msg=f)


def test_co_factors_mm_exact(bt):
    rng = np.random.default_rng(2)
    L = 28
    for _ in range(5):
        n1 = int(rng.integers(6, 14))
        n2 = int(rng.integers(6, 14))
        seq = "".join(rng.choice(list("ACGU"), n1 + n2))
        S = jnp.asarray(encode(seq, L))
        n = jnp.int32(n1 + n2)
        cut = jnp.int32(n1)
        sig = jnp.float32(0.72)
        ref = co_factors(bt, S, n, cut, jnp.float32, sig)
        got = fm.co_factors_mm(bt, S, n, cut, sig)
        gotT = fm.co_factors_mm(bt, S, n, cut, sig, transposed=True)
        for f in ref._fields:
            np.testing.assert_allclose(
                getattr(got, f), getattr(ref, f), rtol=1e-6, atol=1e-30,
                err_msg=f)
            np.testing.assert_allclose(
                getattr(gotT, f), getattr(ref, f).T, rtol=1e-6, atol=1e-30,
                err_msg=f + ".T")
