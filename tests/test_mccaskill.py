"""Differential tests: McCaskill DP vs brute-force enumeration oracle."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from oracles import partition_oracle
from ractip_tpu.ops import mccaskill as mc
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.boltz import get_boltz
from ractip_tpu.params.tables import get_default_params

SEQS = [
    "GGGAAACCC",        # strong hairpin
    "GCGCUUCGGCGC",     # hairpin with stack competition
    "AUAUAUAUAUAU",     # weak AU pairs
    "GGCGAAAGCUAAC",    # mixed
    "ACGUACGUACGU",
]


import functools

import jax


@functools.lru_cache(maxsize=None)
def _fold_fn(L, dtype):
    p = get_default_params()
    return jax.jit(lambda S, n: mc.fold(p, S, n, dtype))


def run_fold(seq, L=32, dtype=jnp.float64):
    p = get_default_params()
    S = encode(seq, L)
    n = len(seq)
    ins, out = _fold_fn(L, dtype)(jnp.asarray(S), jnp.asarray(n))
    bt = get_boltz(p)
    logz = float(jnp.log(ins.zn)) - n * math.log(bt.sigma)
    return logz, np.asarray(out.bpp), ins


@pytest.mark.parametrize("seq", SEQS)
def test_logz_and_bpp_vs_oracle(seq):
    p = get_default_params()
    S = encode(seq)
    Z, bpp_o, _ = partition_oracle(p, S)
    logz, bpp, _ = run_fold(seq)
    assert math.isclose(logz, math.log(Z), rel_tol=1e-9), (logz, math.log(Z))
    n = len(seq)
    np.testing.assert_allclose(bpp[:n, :n], bpp_o, atol=1e-10)


def test_padding_invariance():
    seq = "GGCGAAAGCUAAC"
    logz1, bpp1, _ = run_fold(seq, L=16)
    logz2, bpp2, _ = run_fold(seq, L=48)
    assert math.isclose(logz1, logz2, rel_tol=1e-12)
    np.testing.assert_allclose(bpp1[:13, :13], bpp2[:13, :13], atol=1e-12)


def test_float32_close_to_float64():
    seq = "GCGCUUCGGCGCAAGGCC"
    logz64, bpp64, _ = run_fold(seq, L=32, dtype=jnp.float64)
    logz32, bpp32, _ = run_fold(seq, L=32, dtype=jnp.float32)
    assert abs(logz32 - logz64) < 1e-3
    np.testing.assert_allclose(bpp32, bpp64, atol=2e-4)


def test_row_sums_at_most_one():
    _, bpp, _ = run_fold("GGGCGCAAGCCUUCGGGAAACCC")
    tot = bpp + bpp.T
    assert (tot.sum(axis=1) <= 1.0 + 1e-9).all()


def test_exterior_suffix_matches_prefix():
    seq = "GGCGAAAGCUAAC"
    _, _, ins = run_fold(seq)
    # q2[0] spans the whole sequence = zn
    assert math.isclose(float(ins.q2[0]), float(ins.zn), rel_tol=1e-12)
