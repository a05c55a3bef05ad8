"""Native C++ host library: build, bindings, and shuffle semantics."""

import numpy as np
import pytest

from ractip_tpu import native
from ractip_tpu.pipeline.shuffle import dinuc_shuffle, klet_counts, shuffle_batch

SEQ = "GGAUACUCACGACGCGGUUCAAUCGGGCGUCGUGAGUAUCC"


def test_native_builds_and_loads():
    assert native.available(), "g++ build of libractip_host.so failed"


def test_native_shuffle_preserves_dinucleotides():
    outs = native.ushuffle_batch(SEQ, 2, seed=7, count=64)
    assert outs is not None and len(outs) == 64
    want = klet_counts(SEQ, 2)
    for s in outs:
        assert len(s) == len(SEQ)
        assert klet_counts(s, 2) == want
    # replicates are decorrelated
    assert len(set(outs)) > 32


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_native_shuffle_klets(k):
    outs = native.ushuffle_batch(SEQ, k, seed=3, count=8)
    assert outs is not None
    for s in outs:
        assert sorted(s) == sorted(SEQ)
        if k >= 2:
            assert klet_counts(s, k) == klet_counts(SEQ, k)


def test_native_deterministic_in_seed():
    a = native.ushuffle_batch(SEQ, 2, seed=42, count=4)
    b = native.ushuffle_batch(SEQ, 2, seed=42, count=4)
    c = native.ushuffle_batch(SEQ, 2, seed=43, count=4)
    assert a == b
    assert a != c


def test_native_degenerate_lengths():
    assert native.ushuffle_batch("A", 2, seed=0, count=2) == ["A", "A"]
    assert native.ushuffle_batch("AC", 2, seed=0, count=1) == ["AC"]


def test_shuffle_batch_fallback_matches_semantics():
    outs = shuffle_batch(SEQ, 16, seed=11, prefer_native=False)
    want = klet_counts(SEQ, 2)
    for s in outs:
        assert klet_counts(s, 2) == want
    # python path agrees with native path on the preserved-counts property
    rng = np.random.default_rng(0)
    assert klet_counts(dinuc_shuffle(SEQ, rng), 2) == want
