"""HiGHS MILP backend vs the native PDHG-node branch-and-bound.

The two exact host backends (solver.milp / solver.bnb -- the L3 facade roles,
reference src/ip.h:25-44) must agree on the optimum over every constraint
family combination; solver.milp builds the candidate-space row system that
joint_lp expresses as indicator operators."""

import numpy as np
import jax.numpy as jnp
import pytest

from ractip_tpu.ops.accessibility import accessibility
from ractip_tpu.ops.cofold import cofold_hybrid_probs
from ractip_tpu.ops.mccaskill import base_pair_probs
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.solver import build_problem
from ractip_tpu.solver.bnb import solve_joint as bnb_solve
from ractip_tpu.solver.joint_lp import check_feasible
from ractip_tpu.solver.milp import exact_solve, solve_joint_milp
from ractip_tpu.solver.candidates import SolverConfig

PAIRS = [
    ("GCGCUUGCGUUAAGCAAGCGC", "GCGCUUGCAAGCGC"),
    ("AAGGCUUGCCGUAAGGCAAGCC", "GGCUUGCAAGCC"),
]

CONFIGS = [
    SolverConfig(),
    SolverConfig(min_w=0, max_w=0),          # no accessibility -> cxz rows
    SolverConfig(beta=0.2),                  # beta-gated region rows
    SolverConfig(stacking=False),
    SolverConfig(in_pk=False),
    SolverConfig(acc_max=True),              # accessibility-only objective
]


def _problem(params, s1, s2, cfg):
    L1, L2 = bucket_length(len(s1)), bucket_length(len(s2))
    S1, S2 = jnp.asarray(encode(s1, L1)), jnp.asarray(encode(s2, L2))
    n1, n2 = jnp.int32(len(s1)), jnp.int32(len(s2))
    bpp1 = base_pair_probs(params, S1, n1)
    bpp2 = base_pair_probs(params, S2, n2)
    hp = cofold_hybrid_probs(params, S1, S2, n1, n2)
    pu1 = pu2 = None
    if cfg.accessibility:
        pu1 = np.asarray(accessibility(params, S1, n1, cfg.max_w))
        pu2 = np.asarray(accessibility(params, S2, n2, cfg.max_w))
    prob = build_problem(np.asarray(bpp1), np.asarray(bpp2), np.asarray(hp),
                         pu1, pu2, len(s1), len(s2), cfg)
    return prob, L1, L2


@pytest.fixture(scope="module")
def params():
    return get_default_params()


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_milp_matches_bnb(params, ci):
    cfg = CONFIGS[ci]
    s1, s2 = PAIRS[ci % len(PAIRS)]
    prob, L1, L2 = _problem(params, s1, s2, cfg)
    u_m, obj_m, bound_m, _ = solve_joint_milp(prob, cfg, L1, L2)
    u_b, obj_b, _, _ = bnb_solve(prob, cfg, L1, L2)
    viol = float(check_feasible(prob, cfg, L1, L2,
                                tuple(jnp.asarray(t) for t in u_m)))
    assert viol < 1e-6
    assert obj_m == pytest.approx(obj_b, abs=1e-6)
    assert bound_m == pytest.approx(obj_m, abs=1e-9)  # exact solve


def test_milp_respects_forced_constraints(params):
    """Forced lower bounds (constraint strings) carry into the row system.

    stacking=False so a single forced pair is feasible (under the default
    no-isolated-pairs rows an isolated forced pair is correctly infeasible),
    and accessibility off so the zv region-coupling rows don't forbid a
    forced pair whose endpoint lacks an accessible-region candidate."""
    cfg = SolverConfig(stacking=False, min_w=0, max_w=0)
    s1, s2 = PAIRS[0]
    prob, L1, L2 = _problem(params, s1, s2, cfg)
    zm = np.asarray(prob.zm)
    zlb = np.asarray(prob.zlb).copy()
    live = np.where(zm > 0)[0]
    assert len(live) >= 2
    zlb[live[1]] = 1.0
    prob = prob._replace(zlb=jnp.asarray(zlb))
    u, obj, _, _ = solve_joint_milp(prob, cfg, L1, L2)
    assert u[2][live[1]] == 1.0


def test_exact_solve_backend_env(params, monkeypatch):
    cfg = SolverConfig()
    s1, s2 = PAIRS[0]
    prob, L1, L2 = _problem(params, s1, s2, cfg)
    monkeypatch.setenv("RACTIP_TPU_EXACT_BACKEND", "milp")
    _, obj_m, _, _ = exact_solve(prob, cfg, L1, L2)
    monkeypatch.setenv("RACTIP_TPU_EXACT_BACKEND", "bnb")
    _, obj_b, _, _ = exact_solve(prob, cfg, L1, L2)
    assert obj_m == pytest.approx(obj_b, abs=1e-6)
    monkeypatch.setenv("RACTIP_TPU_EXACT_BACKEND", "bogus")
    with pytest.raises(ValueError):
        exact_solve(prob, cfg, L1, L2)
