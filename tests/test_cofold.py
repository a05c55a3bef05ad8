"""Cofold (joint two-strand McCaskill) vs full joint-structure enumeration.

The oracle enumerates every non-crossing structure of the concatenation
(inter-strand pairs allowed with no minimum span) and scores cut-containing
loops as exterior loops -- the co_pf_fold model.  The DP must reproduce ln Z
and the full pair-probability matrix (intra blocks AND the cross block that
becomes the hybridization matrix) to float64 accuracy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oracles import partition_oracle
from ractip_tpu.ops.cofold import cofold, cofold_hybrid_probs
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params

PAIRS = [
    ("GCGAAA", "UUUCGC"),
    ("GGAC", "GUCC"),                  # blunt duplex, includes (c-1, c) pair
    ("GGGAAACCC", "GGAGG"),            # hairpin-capable strand 1
    ("ACGUACG", "CGUACGU"),
    ("GCAUCC", "GGAUGCAA"),
]


@pytest.mark.parametrize("s1,s2", PAIRS)
def test_cofold_against_enumeration(s1, s2):
    p = get_default_params()
    n1, n2 = len(s1), len(s2)
    S = np.concatenate([encode(s1), encode(s2)])
    Z, bpp_o, _pu = partition_oracle(p, S, cut=n1)

    ins, out = cofold(p, jnp.asarray(encode(s1)), jnp.asarray(encode(s2)),
                      jnp.int32(n1), jnp.int32(n2), dtype=jnp.float64)
    import ractip_tpu.params.boltz as B
    bt = B.get_boltz(p)
    n = n1 + n2
    lnz = float(jnp.log(ins.zn)) - n * np.log(bt.sigma)
    np.testing.assert_allclose(lnz, np.log(Z), rtol=1e-9,
                               err_msg=f"{s1}x{s2} lnZ")

    bpp = np.asarray(out.bpp)[:n, :n]
    np.testing.assert_allclose(bpp, np.triu(bpp_o), atol=1e-10, rtol=1e-6,
                               err_msg=f"{s1}x{s2} bpp")


def test_hybrid_block_and_padding():
    p = get_default_params()
    s1, s2 = "GGGAAACCC", "GGAGG"
    n1, n2 = len(s1), len(s2)
    S = np.concatenate([encode(s1), encode(s2)])
    _Z, bpp_o, _ = partition_oracle(p, S, cut=n1)

    # padded strands: result must be invariant
    hp = np.asarray(cofold_hybrid_probs(
        p, jnp.asarray(encode(s1, 16)), jnp.asarray(encode(s2, 16)),
        jnp.int32(n1), jnp.int32(n2), dtype=jnp.float64))
    want = bpp_o[:n1, n1: n1 + n2]
    np.testing.assert_allclose(hp[:n1, :n2], want, atol=1e-10, rtol=1e-6)
    assert np.all(hp[n1:, :] == 0) and np.all(hp[:, n2:] == 0)


def test_cofold_reduces_to_single_when_strand2_tiny():
    """With an unpairable strand 2 (all A), intra-strand-1 probabilities match
    single-sequence McCaskill (the A's only rescale Z by sigma^n2)."""
    from ractip_tpu.ops.mccaskill import base_pair_probs
    p = get_default_params()
    s1 = "GGGAAACCC"
    n1 = len(s1)
    bpp1 = np.asarray(base_pair_probs(
        p, jnp.asarray(encode(s1)), jnp.int32(n1), dtype=jnp.float64))
    _ins, out = cofold(p, jnp.asarray(encode(s1)), jnp.asarray(encode("AA")),
                       jnp.int32(n1), jnp.int32(2), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(out.bpp)[:n1, :n1], bpp1,
                               atol=1e-10, rtol=1e-6)
