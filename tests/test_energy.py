"""Sanity checks of the scalar energy model against hand-read BL* table values."""

import numpy as np

from ractip_tpu.ops import energy as E
from ractip_tpu.ops.eos import parse_pairs, structure_energy
from ractip_tpu.ops.seq import encode
from ractip_tpu.params.tables import get_default_params


def test_pair_types():
    assert E.pair_type(2, 3) == 1  # CG
    assert E.pair_type(3, 2) == 2  # GC
    assert E.pair_type(3, 4) == 3  # GU
    assert E.pair_type(4, 3) == 4  # UG
    assert E.pair_type(1, 4) == 5  # AU
    assert E.pair_type(4, 1) == 6  # UA
    assert E.pair_type(1, 1) == 0


def test_stack_values():
    p = get_default_params()
    # BL* stack table row CG (reference src/boltzmann_param.c:21-30)
    assert p.stack[1, 1] == -133      # CG on CG
    assert p.stack[1, 2] == -207      # CG on GC
    assert p.stack[2, 2] == -205
    assert p.stack[6, 6] == -68       # UA on UA


def test_ml_and_ninio():
    p = get_default_params()
    assert (p.ml_base, p.ml_closing, p.ml_intern, p.terminal_au) == (-2, 315, 15, 56)
    assert (p.ninio_m, p.max_ninio) == (50, 300)


def test_intloop_generic_symmetric():
    p = get_default_params()
    # generic 3x3 loop between CG and CG (reversed inner: CG)
    e = E.e_intloop(p, 3, 3, 1, 1, 1, 1, 1, 1)
    # internal[6] + 0 ninio + two mismatch_i[CG][A][A]
    assert e == p.internal[6] + 2 * p.mismatch_i[1, 1, 1]


def test_hairpin_tetraloop():
    p = get_default_params()
    S = encode("GCGAAAGC")
    # pair (1,6): closing GC? S[1]=C... choose explicit: CGAAAG is a BL* tetraloop key
    S = encode("ACGAAAGU")
    # pair (i=1, j=6) closes CGAAAG: type CG, loop AAAA size 4
    e = E.e_hairpin(p, S, 1, 6)
    base = p.hairpin[4] + p.mismatch_h[1, S[2], S[5]]
    assert e == base + (-160)  # CGAAAG bonus


def test_structure_energy_runs():
    p = get_default_params()
    seq = "CUCGGCUUGCUGAGGUGCACACAGCAAGAGGCGAG"
    st = "((((.(((((((.........)))))))...))))"
    S = encode(seq)
    e = structure_energy(p, S, parse_pairs(st))
    assert np.isfinite(e)
    assert e < 0  # stable helix


def test_duplex_energy_cut():
    from ractip_tpu.ops.eos import duplex_structure_energy

    p = get_default_params()
    s1 = encode("GGGGG")
    s2 = encode("CCCCC")
    r1 = "[[[[["
    r2 = "]]]]]"
    e = duplex_structure_energy(p, s1, s2, r1, r2)
    # 4 GC-on-GC stacks plus ends: strongly negative
    assert e < -400
