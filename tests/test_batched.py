"""Batched device pipeline vs the exact host path.

The device path (solver.device + pipeline.batched) must reproduce the host
path's problems and optima: same candidate sets/coefficients as
candidates.build_problem, and rounded/repaired solutions matching the host
branch-and-bound objective on instances whose LP relaxation is integral.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ractip_tpu.ops.accessibility import accessibility
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.mccaskill import base_pair_probs
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.batched import predict_batch
from ractip_tpu.pipeline.ractip import Options, solve_pair
from ractip_tpu.io.fasta import Fasta
from ractip_tpu.solver import build_problem, solve_joint
from ractip_tpu.solver.candidates import SolverConfig
from ractip_tpu.solver.device import (build_problem_device,
                                      round_and_repair, solve_joint_device)

PAIRS = [
    ("GCGCUUGCGUUAAGCAAGCGC", "GCGCUUGCAAGCGC"),
    ("AAGGCUUGCCGUAAGGCAAGCC", "GGCUUGCAAGCC"),
]


@pytest.fixture(scope="module")
def params():
    return get_default_params()


def _posteriors(params, s1, s2, cfg):
    L1, L2 = bucket_length(len(s1)), bucket_length(len(s2))
    S1, S2 = jnp.asarray(encode(s1, L1)), jnp.asarray(encode(s2, L2))
    n1, n2 = jnp.int32(len(s1)), jnp.int32(len(s2))
    bpp1 = base_pair_probs(params, S1, n1)
    bpp2 = base_pair_probs(params, S2, n2)
    hp = cofold_hybrid_probs(params, S1, S2, n1, n2)
    pu1 = accessibility(params, S1, n1, cfg.max_w)
    pu2 = accessibility(params, S2, n2, cfg.max_w)
    return (bpp1, bpp2, hp, pu1, pu2), (L1, L2)


def _cand_set(i, j, c, m):
    i, j, c, m = (np.asarray(t) for t in (i, j, c, m))
    return {(int(a), int(b), round(float(x), 5))
            for a, b, x, mm in zip(i, j, c, m) if mm > 0}


def test_device_problem_matches_host(params):
    s1, s2 = PAIRS[0]
    cfg = SolverConfig()
    (bpp1, bpp2, hp, pu1, pu2), (L1, L2) = _posteriors(params, s1, s2, cfg)
    host = build_problem(np.asarray(bpp1), np.asarray(bpp2), np.asarray(hp),
                         np.asarray(pu1), np.asarray(pu2),
                         len(s1), len(s2), cfg)
    dev = build_problem_device(bpp1, bpp2, hp, pu1, pu2,
                               len(s1), len(s2), cfg, (32, 32, 32, 64, 64))
    assert _cand_set(dev.xi, dev.xj, dev.xc, dev.xm) == \
        _cand_set(host.xi, host.xj, host.xc, host.xm)
    assert _cand_set(dev.yi, dev.yj, dev.yc, dev.ym) == \
        _cand_set(host.yi, host.yj, host.yc, host.ym)
    assert _cand_set(dev.zi, dev.zj, dev.zc, dev.zm) == \
        _cand_set(host.zi, host.zj, host.zc, host.zm)
    assert _cand_set(dev.vp, dev.vq, dev.vc, dev.vm) == \
        _cand_set(host.vp, host.vq, host.vc, host.vm)


def test_device_solve_matches_host_bnb(params):
    cfg = SolverConfig()
    for s1, s2 in PAIRS:
        (bpp1, bpp2, hp, pu1, pu2), (L1, L2) = _posteriors(params, s1, s2, cfg)
        dev = build_problem_device(bpp1, bpp2, hp, pu1, pu2,
                                   len(s1), len(s2), cfg, (16, 16, 16, 32, 32))
        u, obj, bound, mv = solve_joint_device(dev, cfg, L1, L2, iters=2000)
        assert float(mv) == 0.0
        host = build_problem(np.asarray(bpp1), np.asarray(bpp2),
                             np.asarray(hp), np.asarray(pu1), np.asarray(pu2),
                             len(s1), len(s2), cfg)
        _, host_obj, host_bound, _ = solve_joint(host, cfg, L1, L2)
        assert float(obj) == pytest.approx(host_obj, abs=2e-3)


def test_round_and_repair_fixes_conflicts(params):
    s1, s2 = PAIRS[0]
    cfg = SolverConfig()
    (bpp1, bpp2, hp, pu1, pu2), (L1, L2) = _posteriors(params, s1, s2, cfg)
    dev = build_problem_device(bpp1, bpp2, hp, pu1, pu2,
                               len(s1), len(s2), cfg, (16, 16, 16, 32, 32))
    # all-ones start: massively infeasible; repair must reach feasibility
    u_bad = tuple(jnp.asarray(m) for m in
                  (dev.xm, dev.ym, dev.zm, dev.vm, dev.wm))
    u, dropped, mv = round_and_repair(dev, cfg, L1, L2, u_bad)
    assert float(mv) == 0.0
    assert int(dropped) > 0


def test_predict_batch_consistent_with_host(params):
    opts = Options()
    res = predict_batch(params, PAIRS, opts, chunk=2, iters=2000,
                        buckets=(16, 16, 16, 64, 64))
    assert np.all(res.violation < 0.5)
    assert np.all(res.overflow <= 0)
    for b, (s1, s2) in enumerate(PAIRS):
        r1, r2, obj, _, _ = solve_pair(params, Fasta("a", s1), Fasta("b", s2),
                                       opts)
        assert res.objective[b] == pytest.approx(obj, abs=2e-3)
        assert res.r1[b] == r1
        assert res.r2[b] == r2


def test_region_bucket_truncation_keeps_useful_regions():
    """Tight v-bucket must keep the low-accessibility region that covers the
    external-pair site, not the high-up regions with no interaction partners
    (the round-1 zero-external-pairs bug on CopA-CopT)."""
    cfg = SolverConfig(min_w=2, max_w=3, th_ss=0.9)
    L1 = L2 = 16
    n = 16
    hp = np.zeros((L1, L2), np.float32)
    hp[2, 5] = hp[3, 4] = 0.9          # interaction site at s1 bases 2-3
    pu1 = np.zeros((L1, cfg.max_w + 1), np.float32)
    pu1[:, 2] = 0.5                     # width-2 regions everywhere, up=0.5
    pu1[2, 2] = 0.01                    # ... except at the site: barely open
    pu2 = pu1.copy()
    pu2[4, 2] = 0.01
    bz = jnp.zeros((L1, L1), jnp.float32)
    dev = build_problem_device(
        jnp.asarray(bz), jnp.asarray(bz), jnp.asarray(hp),
        jnp.asarray(pu1), jnp.asarray(pu2), n, n, cfg,
        (8, 8, 8, 4, 4))                # only 4 region slots vs ~15 candidates
    vset = _cand_set(dev.vp, dev.vq, dev.vc, dev.vm)
    assert any(p <= 2 <= q for (p, q, _) in vset), \
        f"region covering the site was truncated away: {vset}"
    wset = _cand_set(dev.wp, dev.wq, dev.wc, dev.wm)
    assert any(p <= 4 <= q for (p, q, _) in wset)


@pytest.mark.parametrize("B", [pytest.param(1, marks=pytest.mark.smoke), 8])
def test_forced_exact_fallback_through_packed_path(params, B):
    """Regression for the round-4 BENCH crash: _unpack_leaves handed back
    READ-ONLY views of the packed device buffers whenever a slice was
    already C-contiguous (every width-1 leaf; ALL leaves at B=1), and
    _exact_fallback then mutated them in place -> "assignment destination
    is read-only" on the TPU link.  A negative gap tolerance forces the
    host branch-and-bound fallback on EVERY instance through the
    production packed=True path (predict_batch always packs), at both the
    all-contiguous B=1 shape and a B>=8 chunk."""
    pairs = [PAIRS[b % len(PAIRS)] for b in range(B)]
    opts = Options()
    res = predict_batch(params, pairs, opts, chunk=B, iters=1500,
                        buckets=(16, 16, 16, 64, 64),
                        exact_gap_tol=-1.0)   # bound-obj > -1 always fires
    assert np.all(res.violation < 0.5)
    # the fallback re-solves exactly: objective must meet the LP bound
    assert np.all(res.bound - res.objective <= 1e-3)


def test_unpack_leaves_always_writable():
    """Every leaf _unpack_leaves returns must be a writable host array,
    even when the source buffer is a read-only contiguous view."""
    import jax
    from ractip_tpu.pipeline.batched import _unpack_leaves

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.array([1.0, 2.0], np.float32),          # width-1 leaf
            "c": np.array([[3], [4]], np.int32)}
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    specs = [(str(l.dtype), l.shape) for l in leaves]
    packed = {}
    for dt in ("float32", "int32"):
        parts = [l.reshape(2, -1) for l in leaves if str(l.dtype) == dt]
        if parts:
            buf = np.concatenate(parts, axis=1)
            buf.flags.writeable = False      # device buffers arrive read-only
            packed[dt] = buf
    out = _unpack_leaves(packed, treedef, specs)
    for leaf in jax.tree_util.tree_leaves(out):
        assert leaf.flags.writeable
        leaf[...] = 0                        # must not raise
    np.testing.assert_array_equal(np.asarray(packed["float32"][0]),
                                  [0, 1, 2, 1])  # source untouched
