"""Vienna parameter-file (-P) round-trip and override tests.

ViennaRNA itself is not available in this environment, so correctness is
anchored by: (a) exact round-trip of our BL* tables through the v2.0 text
format, (b) section-wise override semantics matching the reference's use of
Vienna::read_parameter_file (reference src/ractip.cpp:1565-1569)."""

import dataclasses

import numpy as np
import pytest

from ractip_tpu.params.tables import get_default_params
from ractip_tpu.params.vienna_par import (apply_par, load_param_file,
                                          parse_par, write_par)


def test_round_trip_exact():
    base = get_default_params()
    text = write_par(base)
    parsed = parse_par(text)
    # start from a scrambled base so every section must be overridden back
    scr = dataclasses.replace(
        base,
        stack=base.stack + 7, mismatch_h=base.mismatch_h + 7,
        mismatch_i=base.mismatch_i + 7, dangle5=base.dangle5 + 7,
        dangle3=base.dangle3 + 7, hairpin=base.hairpin + 7,
        bulge=base.bulge + 7, internal=base.internal + 7,
        ml_base=0, ml_closing=0, ml_intern=0, terminal_au=0,
        ninio_m=0, max_ninio=0, duplex_init=0, lxc=0.0)
    back = apply_par(scr, parsed)
    for f in ("stack", "mismatch_h", "mismatch_i", "dangle5", "dangle3",
              "int11", "int21", "int22", "hairpin", "bulge", "internal"):
        a, b = getattr(base, f), getattr(back, f)
        # INF-marked (forbidden) entries and index-0 pads may normalize;
        # compare all finite table content exactly
        fin = (np.abs(a) < 10000000) & (np.abs(b) < 10000000)
        assert np.array_equal(a[fin], b[fin]), f
        assert np.array_equal(np.abs(a) >= 10000000,
                              np.abs(b) >= 10000000) or f in (
            "stack", "int11", "int21", "int22"), f
    for f in ("ml_base", "ml_closing", "ml_intern", "terminal_au",
              "ninio_m", "max_ninio", "duplex_init"):
        assert getattr(base, f) == getattr(back, f), f
    assert back.lxc == pytest.approx(base.lxc, rel=1e-5)
    assert np.array_equal(np.sort(base.tetraloop_keys),
                          np.sort(back.tetraloop_keys))


def test_partial_override():
    base = get_default_params()
    text = "## RNAfold parameter file v2.0\n\n# ML_params\n10 0 20 0 30 0\n"
    out = apply_par(base, parse_par(text))
    assert (out.ml_base, out.ml_closing, out.ml_intern) == (10, 20, 30)
    assert np.array_equal(out.stack, base.stack)   # untouched sections kept


def test_load_param_file_rejects_non_par(tmp_path):
    p = tmp_path / "x.par"
    p.write_text("not a parameter file")
    with pytest.raises(ValueError):
        load_param_file(str(p), get_default_params())


def test_load_param_file_round_trip(tmp_path):
    base = get_default_params()
    p = tmp_path / "bl.par"
    p.write_text(write_par(base))
    out = load_param_file(str(p), base)
    assert np.array_equal(out.dangle5, base.dangle5)
    assert out.duplex_init == base.duplex_init
