"""Accessibility (unpaired-window) probabilities vs the enumeration oracle.

The oracle's pu[a, b] = P(no base in a..b is paired) covers all four loop
contexts (exterior/hairpin/interior/multiloop) implicitly; the DP must match
to float64 accuracy on sequences small enough to enumerate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oracles import partition_oracle
from ractip_tpu.ops.accessibility import accessibility
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params

# Sequences picked to exercise hairpins, interior loops, bulges and (for the
# longer ones) multiloops.
SEQS = [
    "GGGAAACCC",
    "GCAUCGGAAAUCGAUGC",
    "GGCAGAAACUGCCAAAGGCAAAGCCAA",   # multiloop-capable
    "ACGUACGUACGUA",
    "GGGGAAAACCCCAAAGGGGAAAACCCC",
]


@pytest.mark.parametrize("s", SEQS)
def test_unpaired_window_probs(s):
    p = get_default_params()
    S = encode(s)
    n = len(s)
    _, _, pu_oracle = partition_oracle(p, S)

    max_w = min(8, n)
    pu = np.asarray(accessibility(p, jnp.asarray(S), jnp.int32(n), max_w,
                                  dtype=jnp.float64))
    for w in range(1, max_w + 1):
        want = np.array([pu_oracle[a, a + w - 1] for a in range(n - w + 1)])
        got = pu[: n - w + 1, w]
        np.testing.assert_allclose(got, want, atol=1e-10, rtol=1e-7,
                                   err_msg=f"w={w} seq={s}")
        # out-of-range windows are exactly zero
        assert np.all(pu[n - w + 1:, w] == 0.0)


def test_padding_invariance():
    p = get_default_params()
    s = "GCAUCGGAAAUCGAUGC"
    S0 = encode(s)
    S1 = encode(s, 32)
    a = np.asarray(accessibility(p, jnp.asarray(S0), jnp.int32(len(s)), 5,
                                 dtype=jnp.float64))
    b = np.asarray(accessibility(p, jnp.asarray(S1), jnp.int32(len(s)), 5,
                                 dtype=jnp.float64))
    np.testing.assert_allclose(b[: len(s)], a, atol=1e-12)
