"""Differential test: native PDHG + branch & bound vs the reference ILP.

Random posterior matrices are fed both to ractip_tpu.solver (candidate
extraction -> PDHG LP -> B&B) and to the row-faithful scipy/HiGHS oracle
(ilp_oracle.solve_reference_ilp).  Optimal objectives must agree to 1e-4 (the
acceptance gap -- degenerate problems may have multiple optimal supports), and
the native solution must be feasible.
"""

import numpy as np
import pytest

from ilp_oracle import solve_reference_ilp
from ractip_tpu.solver import (SolverConfig, build_problem, check_feasible,
                               solve_joint)

import jax.numpy as jnp


def random_instance(rng, n1, n2, max_w):
    """Random but structured posteriors: symmetric-ish peaks over thresholds."""
    bpp1 = np.zeros((n1, n1)); bpp2 = np.zeros((n2, n2))
    for m, n in ((bpp1, n1), (bpp2, n2)):
        for _ in range(n):
            i, j = sorted(rng.integers(0, n, 2))
            if j - i >= 3:
                m[i, j] = rng.uniform(0.2, 1.0)
    hp = np.where(rng.random((n1, n2)) < 0.12,
                  rng.uniform(0.05, 1.0, (n1, n2)), 0.0)
    pu1 = rng.uniform(0, 0.6, (n1, max_w + 1))
    pu2 = rng.uniform(0, 0.6, (n2, max_w + 1))
    return bpp1, bpp2, hp, pu1, pu2


CONFIGS = [
    SolverConfig(),                                     # default: acc on
    SolverConfig(min_w=0, max_w=0),                     # no accessibility
    SolverConfig(beta=0.2),                             # region-interaction
    SolverConfig(stacking=False),                       # --allow-isolated
    SolverConfig(min_w=0, max_w=0, stacking=False, in_pk=False),
    SolverConfig(acc_max=True, beta=0.2),               # --acc-max
    SolverConfig(acc_num=2, beta=0.1),
]


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_native_matches_reference_ilp(ci):
    cfg = CONFIGS[ci]
    rng = np.random.default_rng(1234 + ci)
    n1, n2, L = 12, 11, 16
    for trial in range(4):
        bpp1, bpp2, hp, pu1, pu2 = random_instance(rng, n1, n2, cfg.max_w)
        want, _ = solve_reference_ilp(bpp1, bpp2, hp, pu1, pu2, n1, n2, cfg)
        p = build_problem(bpp1, bpp2, hp, pu1, pu2, n1, n2, cfg)
        u, got, bound, nodes = solve_joint(p, cfg, L, L, iters=3000)
        viol = float(check_feasible(p, cfg, L, L,
                                    tuple(jnp.asarray(t) for t in u)))
        assert viol < 0.5, f"cfg{ci} trial{trial}: infeasible ({viol})"
        assert got <= want + 1e-4, \
            f"cfg{ci} trial{trial}: native {got} beats oracle {want}?"
        assert got >= want - 1e-4, \
            f"cfg{ci} trial{trial}: native {got} < oracle {want} " \
            f"(bound {bound}, nodes {nodes})"


def test_forced_constraints():
    cfg = SolverConfig(force_constraint=True, min_w=0, max_w=0)
    rng = np.random.default_rng(7)
    n1 = n2 = 12
    bpp1, bpp2, hp, pu1, pu2 = random_instance(rng, n1, n2, 1)
    str1 = "((......))[."
    str2 = "....]......."
    bpp1[0, 9] = bpp1[1, 8] = 0.4    # below th_ss: forced adds them anyway
    hp[10, 4] = 0.05                 # below th_hy
    want, _ = solve_reference_ilp(bpp1, bpp2, hp, pu1, pu2, n1, n2, cfg,
                                  str1, str2)
    p = build_problem(bpp1, bpp2, hp, pu1, pu2, n1, n2, cfg, str1, str2)
    u, got, bound, nodes = solve_joint(p, cfg, 16, 16, iters=3000)
    # forced pairs are on
    assert u[0][np.asarray(p.xlb) > 0.5].min() > 0.5
    assert u[2][np.asarray(p.zlb) > 0.5].min() > 0.5
    np.testing.assert_allclose(got, want, atol=1e-4)
