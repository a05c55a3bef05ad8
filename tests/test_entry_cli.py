"""Driver entry points and the RactIP-compatible CLI."""

import pytest
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft
from ractip_tpu.cli import build_parser, main, options_from_args


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    obj, bound, mv = jax.jit(fn)(*args)
    assert obj.shape == (2,)
    assert np.all(np.asarray(mv) < 0.5)
    assert np.all(np.asarray(obj) <= np.asarray(bound) + 1e-3)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_cli_defaults_match_reference_ggo():
    args = build_parser().parse_args(["a.fa", "b.fa"])
    opts = options_from_args(args)
    # defaults of reference src/ractip.ggo:7-32
    assert (opts.alpha, opts.beta) == (0.7, 0.0)
    assert (opts.th_ss, opts.th_hy, opts.th_ac) == (0.5, 0.1, 0.003)
    assert (opts.acc_num, opts.max_w, opts.min_w) == (1, 15, 5)
    assert (opts.zscore, opts.num_shuffling, opts.seed) == (0, 1000, 0)
    assert opts.in_pk and opts.stacking and not opts.force_constraint


@pytest.mark.smoke
def test_cli_end_to_end(tmp_path, capsys):
    fa = tmp_path / "pair.fa"
    fa.write_text(">s1\nGCGCUUGCGUUAAGCAAGCGC\n>s2\nGCGCUUGCAAGCGC\n")
    rc = main([str(fa)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == ">s1"
    assert out[1] == "GCGCUUGCGUUAAGCAAGCGC"
    assert set(out[2]) <= set("()[].")
    assert out[3] == ">s2"
    assert len(out[2]) == len(out[1])
    assert len(out[5]) == len(out[4])
