"""End-to-end pipeline smoke tests (CPU, small sequences).

Full-scale corpus runs live in bench.py / the verification harness; these
tests exercise the orchestration paths (joint solve, decode invariants,
solve_ss, energies, z-score loop) on short sequences.
"""

import numpy as np
import pytest

from ractip_tpu.evaluate.fmeasure import PairSets
from ractip_tpu.io.fasta import Fasta
from ractip_tpu.pipeline.ractip import Options, predict, solve_ss
from ractip_tpu.params.tables import get_default_params

# R1inv / R2inv: the shortest real corpus pair (reference data/R{1,2}inv.fa)
R1INV = Fasta("R1inv", "GGCAACGGAUGGUUCGUUGCC")
R2INV = Fasta("R2inv", "GCACCGAACCAUCCGGUGC")


def _check_brackets(fa, r):
    assert len(r) == len(fa.seq)
    assert r.count("(") == r.count(")")   # internal pairs close within strand


def _check_pair(pred):
    assert pred.r1.count("[") == pred.r2.count("]")
    assert "]" not in pred.r1 and "[" not in pred.r2


def test_predict_default():
    pred = predict(R1INV, R2INV, Options())
    _check_brackets(R1INV, pred.r1)
    _check_brackets(R2INV, pred.r2)
    _check_pair(pred)
    ps = PairSets.from_brackets(pred.r1, pred.r2)
    assert len(ps.external) > 0          # known interacting pair
    assert pred.objective > 0


def test_predict_energies():
    pred = predict(R1INV, R2INV, Options(show_energy=True))
    assert pred.e1 is not None and pred.e2 is not None and pred.e3 is not None
    assert pred.e3 < 0                  # hybridization is stabilizing
    assert pred.e1s is not None and pred.e2s is not None


def test_solve_ss_basic():
    p = get_default_params()
    r, obj, e = solve_ss(p, R1INV.seq, Options(), want_energy=True)
    _check_brackets(R1INV, r)
    assert "[" not in r
    assert obj >= 0 and e is not None


def test_zscore_smoke():
    pred = predict(R1INV, R2INV,
                   Options(zscore=12, num_shuffling=3, seed=11))
    assert pred.zscore is not None
    z1, z2 = pred.zscore
    assert np.isfinite(z1) and np.isfinite(z2)


def test_acc_max_mode():
    pred = predict(R1INV, R2INV, Options(acc_max=True, beta=0.1,
                                         show_energy=True))
    assert "(" not in pred.r1 and "(" not in pred.r2
    _check_brackets(R1INV, pred.r1)


def test_contrafold_source():
    # --contrafold: learned-CRF probability source (reference latent path,
    # src/ractip.cpp:195-246); R1inv/R2inv is a strong kissing pair, so the
    # CRF posteriors should still produce external pairs
    pred = predict(R1INV, R2INV, Options(use_contrafold=True))
    _check_brackets(R1INV, pred.r1)
    _check_brackets(R2INV, pred.r2)
    _check_pair(pred)
    assert "[" in pred.r1
