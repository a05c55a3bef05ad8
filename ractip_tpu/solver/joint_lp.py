"""Matrix-free PDHG solver for the joint-structure LP relaxation.

The reference hands its ILP to an external MIP library (GLPK/Gurobi/CPLEX/
SCIP/HiGHS, reference src/ip.cpp); here the LP relaxation is solved natively
on-device with the primal-dual hybrid gradient (Chambolle-Pock) method.  Every
constraint family of reference src/ractip.cpp:715-1222 is expressed as a dense
indicator-matrix operator built from the padded candidate lists, so one PDHG
step is a fixed set of small matmuls/shifts -- fully jittable, vmappable over
instances, and shardable over a device mesh for z-score sweeps.

Families (u = (x, y, z, v, w) binary candidates; helper variables of the
reference are substituted away):

  ax:   per-base internal pairing    sum_{j} x[i,*] <= 1          (:720-728)
  az:   per-base external pairing    sum_k z[i,k] <= 1            (:731-762)
  cxz:  paired at most once (no-accessibility mode)               (:802-828)
  cov:  region overlap               sum_{r contains i} v_r <= 1  (:894-903)
  xv:   internal pair not accessible                              (:832-846)
  zv:   external pair must be accessible                          (:848-861)
  st/en:at most one region start/end per position (binary v_st/v_en
        equality rows, :764-781)
  adj:  no adjoining regions         v_en[i-1] + v_st[i] <= 1     (:905-913)
  num:  region count cap             sum v <= acc_num             (:971-994)
  reg:  beta-gated region-contains-interaction                    (:936-958)
  crz:  external pseudoknot ban      z_a + z_b <= 1 if crossing   (:996-1012)
  crx:  internal pseudoknot ban                                   (:1014-1057)
  sx/sz:stacked-pair (no isolated pairs) rows                     (:1059-1167)

A valid upper bound on the ILP optimum falls out of any dual iterate
(box-constrained LP duality), which branch-and-bound (bnb.py) uses to certify
integral optima.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .candidates import JointProblem, SolverConfig


def _sd(v):  # out[i] = v[i-1]
    return jnp.concatenate([jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)


def _su(v):  # out[i] = v[i+1]
    return jnp.concatenate([v[..., 1:], jnp.zeros_like(v[..., :1])], axis=-1)


class Ops(NamedTuple):
    """Dense indicator operators derived from one problem instance."""

    Xb: jnp.ndarray   # [L1, Kx] both endpoints of x pairs
    X5: jnp.ndarray   # [L1, Kx] 5' endpoint
    X3: jnp.ndarray   # [L1, Kx] 3' endpoint
    Yb: jnp.ndarray; Y5: jnp.ndarray; Y3: jnp.ndarray
    Z1: jnp.ndarray   # [L1, Kz]
    Z2: jnp.ndarray   # [L2, Kz]
    Cov1: jnp.ndarray; St1: jnp.ndarray; En1: jnp.ndarray
    Cov2: jnp.ndarray; St2: jnp.ndarray; En2: jnp.ndarray
    Cx: jnp.ndarray   # [Kx, Kx] crossing-pair mask (internal, s1)
    Cy: jnp.ndarray
    Cz: jnp.ndarray   # [Kz, Kz] crossing-pair mask (external)


def make_ops(p: JointProblem, L1: int, L2: int) -> Ops:
    f32 = jnp.float32

    def oh(idx, m, L):
        return (jax.nn.one_hot(idx, L, dtype=f32) * m[:, None]).T  # [L, K]

    X5 = oh(p.xi, p.xm, L1); X3 = oh(p.xj, p.xm, L1)
    Y5 = oh(p.yi, p.ym, L2); Y3 = oh(p.yj, p.ym, L2)
    Z1 = oh(p.zi, p.zm, L1); Z2 = oh(p.zj, p.zm, L2)

    I1 = jnp.arange(L1)[:, None]
    Cov1 = ((I1 >= p.vp[None, :]) & (I1 <= p.vq[None, :])).astype(f32) * p.vm[None, :]
    I2 = jnp.arange(L2)[:, None]
    Cov2 = ((I2 >= p.wp[None, :]) & (I2 <= p.wq[None, :])).astype(f32) * p.wm[None, :]
    St1 = oh(p.vp, p.vm, L1); En1 = oh(p.vq, p.vm, L1)
    St2 = oh(p.wp, p.wm, L2); En2 = oh(p.wq, p.wm, L2)

    def crossing(i, j, m):
        # pair a strictly "opens before" b and they interleave: i_a<i_b<j_a<j_b
        c = ((i[:, None] < i[None, :]) & (i[None, :] < j[:, None])
             & (j[:, None] < j[None, :]))
        return c.astype(f32) * m[:, None] * m[None, :]

    Cx = crossing(p.xi, p.xj, p.xm)
    Cy = crossing(p.yi, p.yj, p.ym)
    # external pairs cross iff zi_a < zi_b and zj_a < zj_b (ref :996-1012)
    Cz = ((p.zi[:, None] < p.zi[None, :]) & (p.zj[:, None] < p.zj[None, :])
          ).astype(f32) * p.zm[:, None] * p.zm[None, :]

    return Ops(Xb=X5 + X3, X5=X5, X3=X3, Yb=Y5 + Y3, Y5=Y5, Y3=Y3,
               Z1=Z1, Z2=Z2, Cov1=Cov1, St1=St1, En1=En1,
               Cov2=Cov2, St2=St2, En2=En2, Cx=Cx, Cy=Cy, Cz=Cz)


def _families(cfg: SolverConfig):
    """Static list of active family names (selects trace-time code paths)."""
    fam = ["az1", "az2", "crz"]
    if cfg.structure:
        fam += ["ax", "ay"]
        if cfg.in_pk:
            fam += ["crx", "cry"]
    if cfg.accessibility:
        fam += ["cov1", "cov2", "zv", "zw", "st1", "en1", "st2", "en2",
                "adj1", "adj2"]
        if cfg.structure:
            fam += ["xv", "yw"]
        if cfg.acc_num > 0:
            fam += ["nv", "nw"]
        if cfg.beta > 0.0:
            fam += ["regv", "regw"]
    elif cfg.structure:
        fam += ["cxz", "cyz"]
    if cfg.stacking:
        fam += ["sz1", "sz2"]
        if cfg.structure:
            fam += ["sx5", "sx3", "sy5", "sy3"]
    return tuple(fam)


def apply_A(cfg: SolverConfig, ops: Ops, u) -> dict:
    """A u, structured as one array per active constraint family."""
    x, y, z, v, w = u
    rx, ry = ops.Xb @ x, ops.Yb @ y
    rz1, rz2 = ops.Z1 @ z, ops.Z2 @ z
    cv, cw = ops.Cov1 @ v, ops.Cov2 @ w
    out = {}
    for f in _families(cfg):
        if f == "ax": out[f] = rx
        elif f == "ay": out[f] = ry
        elif f == "az1": out[f] = rz1
        elif f == "az2": out[f] = rz2
        elif f == "cxz": out[f] = rx + rz1
        elif f == "cyz": out[f] = ry + rz2
        elif f == "cov1": out[f] = cv
        elif f == "cov2": out[f] = cw
        elif f == "xv": out[f] = rx + cv
        elif f == "yw": out[f] = ry + cw
        elif f == "zv": out[f] = rz1 - cv
        elif f == "zw": out[f] = rz2 - cw
        elif f == "st1": out[f] = ops.St1 @ v
        elif f == "en1": out[f] = ops.En1 @ v
        elif f == "st2": out[f] = ops.St2 @ w
        elif f == "en2": out[f] = ops.En2 @ w
        elif f == "adj1": out[f] = _sd(ops.En1 @ v) + ops.St1 @ v
        elif f == "adj2": out[f] = _sd(ops.En2 @ w) + ops.St2 @ w
        elif f == "nv": out[f] = jnp.sum(v)[None]
        elif f == "nw": out[f] = jnp.sum(w)[None]
        elif f == "regv": out[f] = v - ops.Cov1.T @ rz1
        elif f == "regw": out[f] = w - ops.Cov2.T @ rz2
        elif f == "crx": out[f] = ops.Cx * (x[:, None] + x[None, :])
        elif f == "cry": out[f] = ops.Cy * (y[:, None] + y[None, :])
        elif f == "crz": out[f] = ops.Cz * (z[:, None] + z[None, :])
        elif f == "sx5":
            r = ops.X5 @ x; out[f] = r - _sd(r) - _su(r)
        elif f == "sx3":
            r = ops.X3 @ x; out[f] = r - _sd(r) - _su(r)
        elif f == "sy5":
            r = ops.Y5 @ y; out[f] = r - _sd(r) - _su(r)
        elif f == "sy3":
            r = ops.Y3 @ y; out[f] = r - _sd(r) - _su(r)
        elif f == "sz1": out[f] = rz1 - _sd(rz1) - _su(rz1)
        elif f == "sz2": out[f] = rz2 - _sd(rz2) - _su(rz2)
    return out


def rhs(cfg: SolverConfig, ops: Ops) -> dict:
    """b, matching apply_A's structure."""
    L1, L2 = ops.Z1.shape[0], ops.Z2.shape[0]
    Kx, Ky = ops.Cx.shape[0], ops.Cy.shape[0]
    Kz, Kv, Kw = ops.Cz.shape[0], ops.Cov1.shape[1], ops.Cov2.shape[1]
    one1 = jnp.ones((L1,), jnp.float32); one2 = jnp.ones((L2,), jnp.float32)
    zero1 = jnp.zeros((L1,), jnp.float32); zero2 = jnp.zeros((L2,), jnp.float32)
    b = {}
    for f in _families(cfg):
        if f in ("ax", "az1", "cxz", "cov1", "xv", "st1", "en1", "adj1"):
            b[f] = one1
        elif f in ("ay", "az2", "cyz", "cov2", "yw", "st2", "en2", "adj2"):
            b[f] = one2
        elif f in ("zv", "sx5", "sx3", "sz1"):
            b[f] = zero1
        elif f in ("zw", "sy5", "sy3", "sz2"):
            b[f] = zero2
        elif f in ("nv", "nw"):
            b[f] = jnp.full((1,), float(cfg.acc_num), jnp.float32)
        elif f == "regv":
            b[f] = jnp.zeros((Kv,), jnp.float32)
        elif f == "regw":
            b[f] = jnp.zeros((Kw,), jnp.float32)
        elif f == "crx":
            b[f] = ops.Cx  # b=1 on supported entries, 0 elsewhere
        elif f == "cry":
            b[f] = ops.Cy
        elif f == "crz":
            b[f] = ops.Cz
    return b


def apply_AT(cfg: SolverConfig, ops: Ops, ydual: dict):
    """A^T y, as a primal-structured tuple (gx, gy, gz, gv, gw)."""
    L1, L2 = ops.Z1.shape[0], ops.Z2.shape[0]
    acc1 = jnp.zeros((L1,), jnp.float32)   # weight on rx rows
    acc1z = jnp.zeros((L1,), jnp.float32)  # weight on rz1 rows
    acc2 = jnp.zeros((L2,), jnp.float32)
    acc2z = jnp.zeros((L2,), jnp.float32)
    accv = jnp.zeros((L1,), jnp.float32)   # weight on cv rows
    accw = jnp.zeros((L2,), jnp.float32)
    gx = jnp.zeros(ops.Cx.shape[0], jnp.float32)
    gy = jnp.zeros(ops.Cy.shape[0], jnp.float32)
    gz = jnp.zeros(ops.Cz.shape[0], jnp.float32)
    gv = jnp.zeros(ops.Cov1.shape[1], jnp.float32)
    gw = jnp.zeros(ops.Cov2.shape[1], jnp.float32)

    for f in _families(cfg):
        yk = ydual[f]
        if f == "ax": acc1 = acc1 + yk
        elif f == "ay": acc2 = acc2 + yk
        elif f == "az1": acc1z = acc1z + yk
        elif f == "az2": acc2z = acc2z + yk
        elif f == "cxz": acc1 = acc1 + yk; acc1z = acc1z + yk
        elif f == "cyz": acc2 = acc2 + yk; acc2z = acc2z + yk
        elif f == "cov1": accv = accv + yk
        elif f == "cov2": accw = accw + yk
        elif f == "xv": acc1 = acc1 + yk; accv = accv + yk
        elif f == "yw": acc2 = acc2 + yk; accw = accw + yk
        elif f == "zv": acc1z = acc1z + yk; accv = accv - yk
        elif f == "zw": acc2z = acc2z + yk; accw = accw - yk
        elif f == "st1": gv = gv + ops.St1.T @ yk
        elif f == "en1": gv = gv + ops.En1.T @ yk
        elif f == "st2": gw = gw + ops.St2.T @ yk
        elif f == "en2": gw = gw + ops.En2.T @ yk
        elif f == "adj1": gv = gv + ops.En1.T @ _su(yk) + ops.St1.T @ yk
        elif f == "adj2": gw = gw + ops.En2.T @ _su(yk) + ops.St2.T @ yk
        elif f == "nv": gv = gv + yk[0]
        elif f == "nw": gw = gw + yk[0]
        elif f == "regv":
            gv = gv + yk
            acc1z = acc1z - ops.Cov1 @ yk
        elif f == "regw":
            gw = gw + yk
            acc2z = acc2z - ops.Cov2 @ yk
        elif f == "crx":
            yc = ops.Cx * yk; gx = gx + jnp.sum(yc, 1) + jnp.sum(yc, 0)
        elif f == "cry":
            yc = ops.Cy * yk; gy = gy + jnp.sum(yc, 1) + jnp.sum(yc, 0)
        elif f == "crz":
            yc = ops.Cz * yk; gz = gz + jnp.sum(yc, 1) + jnp.sum(yc, 0)
        elif f == "sx5":
            gx = gx + ops.X5.T @ (yk - _su(yk) - _sd(yk))
        elif f == "sx3":
            gx = gx + ops.X3.T @ (yk - _su(yk) - _sd(yk))
        elif f == "sy5":
            gy = gy + ops.Y5.T @ (yk - _su(yk) - _sd(yk))
        elif f == "sy3":
            gy = gy + ops.Y3.T @ (yk - _su(yk) - _sd(yk))
        elif f == "sz1":
            acc1z = acc1z + yk - _su(yk) - _sd(yk)
        elif f == "sz2":
            acc2z = acc2z + yk - _su(yk) - _sd(yk)

    gx = gx + ops.Xb.T @ acc1
    gy = gy + ops.Yb.T @ acc2
    gz = gz + ops.Z1.T @ acc1z + ops.Z2.T @ acc2z
    gv = gv + ops.Cov1.T @ accv
    gw = gw + ops.Cov2.T @ accw
    return (gx, gy, gz, gv, gw)


def _coefs(p: JointProblem):
    return (p.xc * p.xm, p.yc * p.ym, p.zc * p.zm, p.vc * p.vm, p.wc * p.wm)


def _bounds(p: JointProblem, fix_lb=None, fix_ub=None):
    """Box bounds; fix_lb/fix_ub override for branch-and-bound fixings."""
    lb = (p.xlb, p.ylb, p.zlb,
          jnp.zeros_like(p.vc), jnp.zeros_like(p.wc))
    ub = (p.xm, p.ym, p.zm, p.vm, p.wm)
    if fix_lb is not None:
        lb = tuple(jnp.maximum(a, b) for a, b in zip(lb, fix_lb))
    if fix_ub is not None:
        ub = tuple(jnp.minimum(a, b) for a, b in zip(ub, fix_ub))
    return lb, ub


def _tmap(f, *ts):
    return tuple(f(*args) for args in zip(*ts))


def _dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(a, b))


def _op_norm(cfg, ops, u0, iters: int = 30):
    """Power iteration for ||A||_2 on the composite operator."""

    def body(_, s):
        u, _nrm2 = s
        w = apply_AT(cfg, ops, apply_A(cfg, ops, u))
        nrm2 = jnp.sqrt(_dot(w, w))       # ~ lambda_max(A^T A) for unit u
        u = _tmap(lambda t: t / jnp.maximum(nrm2, 1e-30), w)
        return (u, nrm2)

    u0n = jnp.sqrt(_dot(u0, u0))
    u0 = _tmap(lambda t: t / jnp.maximum(u0n, 1e-30), u0)
    _, nrm2 = jax.lax.fori_loop(0, iters, body, (u0, jnp.float32(1.0)))
    return jnp.sqrt(jnp.maximum(nrm2, 1e-6))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "L1", "L2", "iters", "restarts"))
def pdhg_solve(p: JointProblem, cfg: SolverConfig, L1: int, L2: int,
               iters: int = 4000, fix_lb=None, fix_ub=None,
               u0=None, y0=None, restarts: int = 0):
    """Run PDHG on the LP relaxation.

    Returns (u, ydual, ub_bound): primal iterate (averaged tail), final duals,
    and a rigorous upper bound on the (box-constrained) LP/ILP optimum.
    u0/y0 warm-start the iteration (e.g. from a parent branch-and-bound node).
    restarts > 0 splits the budget into restarts+1 segments, restarting each
    from the previous segment's AVERAGE iterate (PDLP-style fixed-frequency
    restart).  Measured on this problem family the averaged tail already
    converges as well (bounds equal at iters=4000, restarts occasionally
    WORSE at 1500), so the default stays 0; the knob exists for harder
    instances.
    """
    ops = make_ops(p, L1, L2)
    c = _coefs(p)
    lb, ub = _bounds(p, fix_lb, fix_ub)
    b = rhs(cfg, ops)

    seed = _tmap(lambda t: jnp.ones_like(t), c)
    nrm = _op_norm(cfg, ops, seed)
    tau = 1.0 / jnp.maximum(nrm, 1e-3)
    sig = 1.0 / jnp.maximum(nrm, 1e-3)

    if u0 is None:
        u0 = _tmap(lambda l, h: 0.5 * (l + h), lb, ub)
    else:
        u0 = _tmap(lambda t, l, h: jnp.clip(t, l, h), u0, lb, ub)
    if y0 is None:
        y0 = {k: jnp.zeros_like(v) for k, v in b.items()}

    def step(_, st):
        u, y, uavg, yavg = st
        g = apply_AT(cfg, ops, y)
        un = _tmap(lambda uu, cc, gg, l, h: jnp.clip(uu + tau * (cc - gg), l, h),
                   u, c, g, lb, ub)
        ue = _tmap(lambda a, bb: 2.0 * a - bb, un, u)
        au = apply_A(cfg, ops, ue)
        yn = {k: jnp.maximum(y[k] + sig * (au[k] - b[k]), 0.0) for k in y}
        uavg = _tmap(lambda a, bb: a + bb, uavg, un)
        yavg = {k: yavg[k] + yn[k] for k in y}
        return (un, yn, uavg, yavg)

    def run_segment(u, y, n):
        u, y, ua, ya = jax.lax.fori_loop(
            0, n, step, (u, y, _tmap(jnp.zeros_like, u),
                         {k: jnp.zeros_like(v) for k, v in y.items()}))
        ua = _tmap(lambda t: t / float(n), ua)
        ya = {k: v / float(n) for k, v in ya.items()}
        return u, y, ua, ya

    if restarts > 0:
        seg = max(iters // (restarts + 1), 1)
        u, y = u0, y0
        for _ in range(restarts):
            _, _, u, y = run_segment(u, y, seg)   # restart at the average
        u, y, uavg, yavg = run_segment(u, y, iters - restarts * seg)
    else:
        # legacy two-phase: run, then tail-average the last half
        half = iters // 2
        u, y, _, _ = run_segment(u0, y0, max(half, 1))
        u, y, uavg, yavg = run_segment(u, y, max(iters - half, 1))

    bound = dual_bound(p, cfg, ops, yavg, fix_lb, fix_ub)
    bound_last = dual_bound(p, cfg, ops, y, fix_lb, fix_ub)
    return uavg, yavg, jnp.minimum(bound, bound_last)


def dual_bound(p: JointProblem, cfg: SolverConfig, ops: Ops, ydual: dict,
               fix_lb=None, fix_ub=None):
    """b^T y + max_{lb<=u<=ub} (c - A^T y)^T u  -- valid for any y >= 0."""
    c = _coefs(p)
    lb, ub = _bounds(p, fix_lb, fix_ub)
    b = rhs(cfg, ops)
    g = apply_AT(cfg, ops, ydual)
    red = _tmap(lambda cc, gg: cc - gg, c, g)
    box = sum(jnp.sum(ubk * jnp.maximum(r, 0) + lbk * jnp.minimum(r, 0))
              for r, lbk, ubk in zip(red, lb, ub))
    bty = sum(jnp.vdot(ydual[k], b[k]) for k in ydual)
    return bty + box


def primal_objective(p: JointProblem, u) -> jnp.ndarray:
    return _dot(_coefs(p), u)


def check_feasible(p: JointProblem, cfg: SolverConfig, L1: int, L2: int, u,
                   tol: float = 1e-4):
    """Max constraint violation of a (rounded) primal point."""
    ops = make_ops(p, L1, L2)
    au = apply_A(cfg, ops, u)
    b = rhs(cfg, ops)
    viol = [jnp.max(au[k] - b[k], initial=0.0) for k in au]
    return jnp.max(jnp.stack(viol))
