"""Device-side problem assembly and batched integral solving.

The host path (candidates.build_problem + bnb.solve_joint) gives exact,
certified optima for single headline pairs.  Batch workloads -- the 1000-decoy
z-score sweep (reference src/ractip.cpp:1624-1669) and corpus sweeps -- need
the *entire* per-instance pipeline to live inside one jit so it can be vmapped
and sharded over a device mesh.  This module provides that:

  build_problem_device  -- threshold sparsification as top-K selection with
                           static candidate buckets (the trace-time analogue of
                           the reference's p > theta column scan,
                           src/ractip.cpp:551-653);
  round_and_repair      -- jittable integralization: round the PDHG iterate,
                           then a drop-only greedy repair loop (each step drops
                           the lowest-coefficient candidate participating in a
                           violated row) that terminates at a feasible binary
                           point;
  solve_joint_device    -- PDHG + round_and_repair in one jittable call,
                           vmappable over stacked JointProblem pytrees.

The drop-only repair is exact whenever the LP relaxation is integral (typical
for these pairing polytopes); tests/test_batched.py quantifies the objective
gap against the host branch-and-bound on the benchmark corpus.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .candidates import JointProblem, SolverConfig
from .joint_lp import apply_A, apply_AT, make_ops, pdhg_solve, rhs


def _topk_select(score: jnp.ndarray, valid: jnp.ndarray, th: float, K: int):
    """Top-K entries of a flattened score matrix above threshold th.

    Returns (flat_idx[K], val[K], mask[K]); masked slots have val 0.  Selected
    entries are re-sorted to ascending flat index so candidate order is
    deterministic (mirrors the reference's column-scan order closely enough
    for reproducibility; the optimum is order-independent).
    """
    flat = jnp.where(valid, score, -jnp.inf).reshape(-1)
    if flat.shape[0] < K:
        flat = jnp.concatenate(
            [flat, jnp.full((K - flat.shape[0],), -jnp.inf, flat.dtype)])
    val, idx = jax.lax.top_k(flat, K)
    m = val > th
    order = jnp.argsort(jnp.where(m, idx, jnp.iinfo(jnp.int32).max))
    idx = idx[order]
    val = jnp.where(m[order], val[order], 0.0)
    return idx, val, m[order].astype(jnp.float32)


def _topk_scored(score: jnp.ndarray, value: jnp.ndarray, valid: jnp.ndarray,
                 K: int):
    """Top-K *valid* entries ranked by `score`, carrying `value` through.

    Unlike _topk_select (rank == threshold test == value), this separates the
    ranking key from the kept payload: region candidates are admitted by
    up > th_ac but ranked by how much external-pair objective mass they can
    cover -- keeping the K highest-up regions instead silently drops exactly
    the low-accessibility windows where interactions live (the round-1
    zero-external-pairs bug on CopA-CopT).
    """
    flat_s = jnp.where(valid, score, -jnp.inf).reshape(-1)
    flat_v = value.reshape(-1)
    if flat_s.shape[0] < K:
        pad = K - flat_s.shape[0]
        flat_s = jnp.concatenate(
            [flat_s, jnp.full((pad,), -jnp.inf, flat_s.dtype)])
        flat_v = jnp.concatenate([flat_v, jnp.zeros((pad,), flat_v.dtype)])
    sv, idx = jax.lax.top_k(flat_s, K)
    m = sv > -jnp.inf
    order = jnp.argsort(jnp.where(m, idx, jnp.iinfo(jnp.int32).max))
    idx = idx[order]
    m = m[order]
    val = jnp.where(m, flat_v[idx], 0.0)
    return idx, val, m.astype(jnp.float32)


def build_problem_device(bpp1, bpp2, hp, pu1, pu2, n1, n2,
                         cfg: SolverConfig,
                         buckets: tuple[int, int, int, int, int]) -> JointProblem:
    """Trace-time JointProblem assembly (static candidate buckets).

    Inputs are the posterior matrices as produced by the ops engines;
    n1/n2 may be traced.  Equivalent semantics to candidates.build_problem
    without forced-constraint strings (batch workloads never carry them).
    """
    kx, ky, kz, kv, kw = buckets
    L1, L2 = bpp1.shape[0], bpp2.shape[0]

    def intra(bpp, n, L, K):
        I = jnp.arange(L)[:, None]
        J = jnp.arange(L)[None, :]
        valid = (I < J) & (J < n)
        idx, p, m = _topk_select(bpp, valid, cfg.th_ss, K)
        i, j = idx // L, idx % L
        c = jnp.where(m > 0, p - cfg.th_ss, 0.0)
        return i.astype(jnp.int32), j.astype(jnp.int32), c.astype(jnp.float32), m

    if cfg.structure:
        xi, xj, xc, xm = intra(bpp1, n1, L1, kx)
        yi, yj, yc, ym = intra(bpp2, n2, L2, ky)
    else:
        zzi = jnp.zeros((kx,), jnp.int32)
        xi, xj = zzi, zzi
        xc, xm = jnp.zeros((kx,), jnp.float32), jnp.zeros((kx,), jnp.float32)
        zzy = jnp.zeros((ky,), jnp.int32)
        yi, yj = zzy, zzy
        yc, ym = jnp.zeros((ky,), jnp.float32), jnp.zeros((ky,), jnp.float32)

    I1 = jnp.arange(L1)[:, None]
    I2 = jnp.arange(L2)[None, :]
    zvalid = (I1 < n1) & (I2 < n2)
    idx, p, zm = _topk_select(hp, zvalid, cfg.th_hy, kz)
    zi = (idx // L2).astype(jnp.int32)
    zj = (idx % L2).astype(jnp.int32)
    zc = jnp.where(zm > 0, cfg.alpha * (p - cfg.th_hy), 0.0).astype(jnp.float32)

    # per-base external-pair objective mass (each base hosts <= 1 external
    # pair, so the max over partners bounds its contribution)
    zgain = jnp.where(zvalid, jnp.maximum(hp - cfg.th_hy, 0.0), 0.0)
    zmass1 = cfg.alpha * jnp.max(zgain, axis=1)                   # [L1]
    zmass2 = cfg.alpha * jnp.max(zgain, axis=0)                   # [L2]

    def regions(pu, n, L, K, zmass):
        # widths min_w..max_w; pu column wd = width-wd window at start i
        wn = cfg.max_w - cfg.min_w + 1
        widths = cfg.min_w + jnp.arange(wn)[None, :]              # [1, WN]
        starts = jnp.arange(L)[:, None]                           # [L, 1]
        ends = starts + widths - 1
        vals = jax.lax.dynamic_slice(
            pu, (0, cfg.min_w), (L, wn)) if pu.shape[1] >= cfg.min_w + wn \
            else jnp.zeros((L, wn), pu.dtype)
        valid = (ends < n) & (vals > cfg.th_ac)
        # rank candidate regions by the external-pair mass they can cover
        # (+ their own beta objective); admission stays up > th_ac
        cs = jnp.concatenate([jnp.zeros((1,), zmass.dtype),
                              jnp.cumsum(zmass)])
        cover = cs[jnp.clip(ends, 0, L - 1) + 1] - cs[starts]
        score = cover + cfg.beta * (vals - cfg.th_ac) + 1e-6 * vals
        idx, u, m = _topk_scored(score, vals, valid, K)
        i = (idx // wn).astype(jnp.int32)
        q = i + cfg.min_w + (idx % wn).astype(jnp.int32) - 1
        c = jnp.where(m > 0, cfg.beta * (u - cfg.th_ac), 0.0)
        return (jnp.where(m > 0, i, 0).astype(jnp.int32),
                jnp.where(m > 0, q, 0).astype(jnp.int32),
                c.astype(jnp.float32), m)

    if cfg.accessibility and pu1 is not None:
        vp, vq, vc, vm = regions(pu1, n1, L1, kv, zmass1)
        wp, wq, wc, wm = regions(pu2, n2, L2, kw, zmass2)
    else:
        # explicit f32: under jax_enable_x64 a bare jnp.zeros defaults to
        # f64, which leaks into the PDHG carries and breaks the fori_loop
        zv = jnp.zeros((kv,), jnp.int32)
        vp, vq = zv, zv
        vc, vm = jnp.zeros((kv,), jnp.float32), jnp.zeros((kv,), jnp.float32)
        zw = jnp.zeros((kw,), jnp.int32)
        wp, wq = zw, zw
        wc, wm = jnp.zeros((kw,), jnp.float32), jnp.zeros((kw,), jnp.float32)

    return JointProblem(
        xi=xi, xj=xj, xc=xc, xm=xm, yi=yi, yj=yj, yc=yc, ym=ym,
        zi=zi, zj=zj, zc=zc, zm=zm, vp=vp, vq=vq, vc=vc, vm=vm,
        wp=wp, wq=wq, wc=wc, wm=wm,
        xlb=jnp.zeros((kx,), jnp.float32), ylb=jnp.zeros((ky,), jnp.float32),
        zlb=jnp.zeros((kz,), jnp.float32),
        n1=jnp.asarray(n1, jnp.int32), n2=jnp.asarray(n2, jnp.int32))


def region_candidate_count(pu, n, L, cfg: SolverConfig):
    """Number of admissible accessible-region candidates (for overflow
    accounting against the static v/w buckets)."""
    wn = cfg.max_w - cfg.min_w + 1
    widths = cfg.min_w + jnp.arange(wn)[None, :]
    starts = jnp.arange(L)[:, None]
    ends = starts + widths - 1
    vals = jax.lax.dynamic_slice(
        pu, (0, cfg.min_w), (L, wn)) if pu.shape[1] >= cfg.min_w + wn \
        else jnp.zeros((L, wn), pu.dtype)
    return jnp.sum((ends < n) & (vals > cfg.th_ac))


def round_and_repair(p: JointProblem, cfg: SolverConfig, L1: int, L2: int,
                     u_lp, tol: float = 1e-3, fix_lb=None, fix_ub=None):
    """Round an LP iterate and greedily drop until feasible (jittable).

    Returns (u, n_dropped, max_violation).  max_violation is 0 when the repair
    converged to a feasible binary point (it always does unless forced lower
    bounds themselves conflict, which batch problems never carry).
    fix_lb/fix_ub pin variables (e.g. the stage-2 region fixings).
    """
    ops = make_ops(p, L1, L2)
    b = rhs(cfg, ops)
    masks = (p.xm, p.ym, p.zm, p.vm, p.wm)
    coefs = (p.xc, p.yc, p.zc, p.vc, p.wc)
    lbs = (p.xlb, p.ylb, p.zlb, jnp.zeros_like(p.vm), jnp.zeros_like(p.wm))
    if fix_lb is not None:
        lbs = tuple(jnp.maximum(a, f) for a, f in zip(lbs, fix_lb))
    if fix_ub is not None:
        masks = tuple(jnp.minimum(a, f) for a, f in zip(masks, fix_ub))
    sizes = tuple(m.shape[0] for m in masks)

    u0 = tuple(jnp.maximum(jnp.round(t) * m, l)
               for t, m, l in zip(u_lp, masks, lbs))

    def viol_of(u):
        au = apply_A(cfg, ops, u)
        return {k: (au[k] - b[k] > tol).astype(jnp.float32) for k in au}

    def max_viol(u):
        au = apply_A(cfg, ops, u)
        return jnp.max(jnp.stack([jnp.max(au[k] - b[k], initial=0.0)
                                  for k in au]))

    def state_of(u):
        v = viol_of(u)
        nviol = sum(jnp.sum(t) for t in v.values())
        return v, nviol

    def cond(st):
        u, dropped, nviol, stuck = st
        return (nviol > 0) & (~stuck)

    def step(st):
        u, dropped, _, _ = st
        v = viol_of(u)
        g = apply_AT(cfg, ops, v)          # signed participation per candidate
        flat_g = jnp.concatenate(g)
        flat_u = jnp.concatenate(u)
        flat_c = jnp.concatenate(coefs)
        flat_lb = jnp.concatenate(lbs)
        elig = (flat_u > 0.5) & (flat_g > tol) & (flat_lb < 0.5)
        key = jnp.where(elig, flat_c, jnp.inf)
        k = jnp.argmin(key)
        stuck = ~jnp.any(elig)
        flat_u = jnp.where(stuck, flat_u, flat_u.at[k].set(0.0))
        parts = []
        off = 0
        for s in sizes:
            parts.append(jax.lax.dynamic_slice(flat_u, (off,), (s,)))
            off += s
        u = tuple(parts)
        _, nviol = state_of(u)
        return (u, dropped + jnp.where(stuck, 0, 1), nviol, stuck)

    _, nviol0 = state_of(u0)
    u, dropped, _, _ = jax.lax.while_loop(
        cond, step, (u0, jnp.int32(0), nviol0, jnp.bool_(False)))
    return u, dropped, max_viol(u)


def _region_fixings(p: JointProblem, cfg: SolverConfig, L1: int, L2: int,
                    u_lp):
    """Integral region selection from the stage-1 LP iterate.

    The accessibility coupling (reference src/ractip.cpp:848-861 zv rows with
    the acc_num cap :971-994) makes the LP relaxation fractional on long
    antiparallel duplexes: the LP spreads region mass over overlapping
    windows, naive rounding then drops every external pair.  This picks the
    acc_num windows per side that cover the most LP external-pair mass
    (exactly what the MIP branch decides first) and returns (fix_lb, fix_ub)
    pinning them, so the stage-2 LP is near-integral.
    """
    x, y, z, v, w = u_lp
    zrow1 = jnp.zeros((L1,), jnp.float32).at[p.zi].add(z * p.zm)
    zrow2 = jnp.zeros((L2,), jnp.float32).at[p.zj].add(z * p.zm)

    def pick(zrow, vp, vq, vc, vm, v_lp):
        cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(zrow)])
        gain = cs[vq + 1] - cs[vp]
        base = gain + vc + 1e-3 * v_lp
        avail = vm > 0
        lb = jnp.zeros_like(vm)
        for _ in range(cfg.acc_num):
            score = jnp.where(avail, base, -jnp.inf)
            k = jnp.argmax(score)
            ok = score[k] > 1e-4
            lb = jnp.where(ok, lb.at[k].set(1.0), lb)
            # picked region excludes overlapping/adjoining candidates
            touch = (vp <= vq[k] + 1) & (vq >= vp[k] - 1)
            avail = avail & jnp.where(ok, ~touch, avail)
        return lb, lb    # ub = lb: non-chosen regions pinned to 0

    vlb, vub = pick(zrow1, p.vp, p.vq, p.vc * p.vm, p.vm, v)
    wlb, wub = pick(zrow2, p.wp, p.wq, p.wc * p.wm, p.wm, w)
    ones = lambda t: jnp.ones_like(t)
    fix_lb = (jnp.zeros_like(p.xm), jnp.zeros_like(p.ym),
              jnp.zeros_like(p.zm), vlb, wlb)
    fix_ub = (ones(p.xm), ones(p.ym), ones(p.zm), vub, wub)
    return fix_lb, fix_ub


@functools.partial(jax.jit, static_argnames=("cfg", "L1", "L2", "iters"))
def solve_joint_device(p: JointProblem, cfg: SolverConfig, L1: int, L2: int,
                       iters: int = 2000):
    """On-device solve: PDHG LP + (conditional region stage) + round/repair.

    Returns (u, objective, lp_bound, max_violation).  objective <= optimum <=
    lp_bound; the gap is reported so callers can fall back to the host
    branch-and-bound for instances where it exceeds tolerance.
    """
    u_lp, ydual, bound = pdhg_solve(p, cfg, L1, L2, iters=iters)
    u, _dropped, mv = round_and_repair(p, cfg, L1, L2, u_lp)
    coefs = (p.xc * p.xm, p.yc * p.ym, p.zc * p.zm, p.vc * p.vm, p.wc * p.wm)

    def objective(t):
        return sum(jnp.vdot(c, tt) for c, tt in zip(coefs, t))

    obj = objective(u)
    if cfg.accessibility and cfg.acc_num > 0:
        # stage 2: pin the LP-guided integral region choice and re-solve,
        # warm-started from the stage-1 primal/dual iterates (the fixed
        # problem differs only in the region box bounds, so a third of the
        # budget recovers the same iterate quality as a cold full run)
        fix_lb, fix_ub = _region_fixings(p, cfg, L1, L2, u_lp)
        u_lp2, _y2, _b2 = pdhg_solve(p, cfg, L1, L2,
                                     iters=max(iters // 3, 200),
                                     fix_lb=fix_lb, fix_ub=fix_ub,
                                     u0=u_lp, y0=ydual)
        u2, _d2, mv2 = round_and_repair(p, cfg, L1, L2, u_lp2,
                                        fix_lb=fix_lb, fix_ub=fix_ub)
        obj2 = objective(u2)
        better = (mv2 <= 1e-6) & ((obj2 > obj) | (mv > 1e-6))
        u = jax.tree_util.tree_map(
            lambda a, bb: jnp.where(better, bb, a), u, u2)
        obj = jnp.where(better, obj2, obj)
        mv = jnp.where(better, mv2, mv)
    return u, obj, bound, mv
