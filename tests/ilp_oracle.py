"""Reference-faithful ILP oracle for the joint-structure program.

Re-builds the reference's exact ILP row by row (reference src/ractip.cpp:
516-1222) -- including the binary helper variables x_un/y_un/z_un/v_st/v_en --
and solves it with scipy's HiGHS MILP.  This is an independent implementation
used only as a differential-testing oracle for ractip_tpu.solver, which
substitutes the helpers away and solves natively with PDHG + branch & bound.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import LinearConstraint, milp
from scipy.sparse import lil_matrix

from ractip_tpu.solver.candidates import SolverConfig


class _IP:
    def __init__(self):
        self.obj = []
        self.rows = []        # (lo, hi, {col: coef})

    def var(self, coef=0.0):
        self.obj.append(coef)
        return len(self.obj) - 1

    def constraint(self, lo, hi):
        self.rows.append([lo, hi, {}])
        return len(self.rows) - 1

    def add(self, row, col, val):
        d = self.rows[row][2]
        d[col] = d.get(col, 0.0) + val

    def solve(self):
        n = len(self.obj)
        A = lil_matrix((len(self.rows), n))
        lo = np.empty(len(self.rows)); hi = np.empty(len(self.rows))
        for r, (l, h, cols) in enumerate(self.rows):
            lo[r], hi[r] = l, h
            for cidx, val in cols.items():
                A[r, cidx] = val
        res = milp(c=-np.asarray(self.obj),
                   constraints=LinearConstraint(A.tocsr(), lo, hi),
                   integrality=np.ones(n),
                   bounds=(0, 1))
        assert res.success, res.message
        return -res.fun, res.x


def solve_reference_ilp(bpp1, bpp2, hp, pu1, pu2, n1, n2,
                        cfg: SolverConfig, str1="", str2=""):
    """Returns (objective, detail dict) of the reference ILP optimum."""
    ip = _IP()
    UP, LO, FX = "UP", "LO", "FX"

    def mk(bnd, lo, hi):
        if bnd == UP:
            return ip.constraint(-np.inf, hi)
        if bnd == LO:
            return ip.constraint(lo, np.inf)
        return ip.constraint(lo, hi)

    acc = cfg.accessibility
    st1_en = cfg.structure
    st2_en = cfg.structure

    x = -np.ones((n1, n1), int); x_un = -np.ones(n1, int)
    if st1_en:
        for j in range(1, n1):
            for i in range(j - 1, -1, -1):
                if bpp1[i, j] > cfg.th_ss:
                    x[i, j] = x[j, i] = ip.var(bpp1[i, j] - cfg.th_ss)
        for i in range(n1):
            x_un[i] = ip.var(0.0)
    y = -np.ones((n2, n2), int); y_un = -np.ones(n2, int)
    if st2_en:
        for j in range(1, n2):
            for i in range(j - 1, -1, -1):
                if bpp2[i, j] > cfg.th_ss:
                    y[i, j] = y[j, i] = ip.var(bpp2[i, j] - cfg.th_ss)
        for i in range(n2):
            y_un[i] = ip.var(0.0)
    z = -np.ones((n1, n2), int)
    for i in range(n1):
        for j in range(n2):
            if hp[i, j] > cfg.th_hy:
                z[i, j] = ip.var(cfg.alpha * (hp[i, j] - cfg.th_hy))
    z_un1 = np.array([ip.var(0.0) for _ in range(n1)])
    z_un2 = np.array([ip.var(0.0) for _ in range(n2)])

    v, vv, w, ww = [], [], [], []
    if acc:
        for i in range(n1):
            for wd in range(cfg.min_w, cfg.max_w + 1):
                if i + wd - 1 < n1 and pu1[i, wd] > cfg.th_ac:
                    v.append(ip.var(cfg.beta * (pu1[i, wd] - cfg.th_ac)))
                    vv.append((i, i + wd - 1))
        for i in range(n2):
            for wd in range(cfg.min_w, cfg.max_w + 1):
                if i + wd - 1 < n2 and pu2[i, wd] > cfg.th_ac:
                    w.append(ip.var(cfg.beta * (pu2[i, wd] - cfg.th_ac)))
                    ww.append((i, i + wd - 1))
    v_st = np.array([ip.var(0.0) for _ in range(n1)])
    v_en = np.array([ip.var(0.0) for _ in range(n1)])
    w_st = np.array([ip.var(0.0) for _ in range(n2)])
    w_en = np.array([ip.var(0.0) for _ in range(n2)])

    def forced_pairs(s, oc, cc):
        stck, out = [], []
        for i, ch in enumerate(s):
            if ch == oc: stck.append(i)
            elif ch == cc: out.append((stck.pop(), i))
        return out

    fx = fy = fz = ()
    if cfg.force_constraint:
        fx = forced_pairs(str1, "(", ")")
        fy = forced_pairs(str2, "(", ")")
        zo = [i for i, ch in enumerate(str1) if ch == "["]
        zc = [j for j, ch in enumerate(str2) if ch == "]"]
        fz = list(zip(zo, reversed(zc)))
        for (i, j) in fx:
            if x[i, j] < 0:
                x[i, j] = x[j, i] = ip.var(bpp1[i, j] - cfg.th_ss)
        for (i, j) in fy:
            if y[i, j] < 0:
                y[i, j] = y[j, i] = ip.var(bpp2[i, j] - cfg.th_ss)
        for (i, j) in fz:
            if z[i, j] < 0:
                z[i, j] = ip.var(cfg.alpha * (hp[i, j] - cfg.th_hy))

    # helper-variable equality rows (:717-762)
    if st1_en:
        for i in range(n1):
            r = mk(FX, 1, 1); ip.add(r, x_un[i], 1)
            for j in range(n1):
                if x[i, j] >= 0: ip.add(r, x[i, j], 1)
    for i in range(n1):
        r = mk(FX, 1, 1); ip.add(r, z_un1[i], 1)
        for j in range(n2):
            if z[i, j] >= 0: ip.add(r, z[i, j], 1)
    if st2_en:
        for i in range(n2):
            r = mk(FX, 1, 1); ip.add(r, y_un[i], 1)
            for j in range(n2):
                if y[i, j] >= 0: ip.add(r, y[i, j], 1)
    for i in range(n2):
        r = mk(FX, 1, 1); ip.add(r, z_un2[i], 1)
        for j in range(n1):
            if z[j, i] >= 0: ip.add(r, z[j, i], 1)

    if acc:
        # region start/end bookkeeping (:764-798)
        rs = [mk(FX, 0, 0) for _ in range(n1)]
        re = [mk(FX, 0, 0) for _ in range(n1)]
        for i in range(n1):
            ip.add(rs[i], v_st[i], -1); ip.add(re[i], v_en[i], -1)
        for k, (pp, qq) in enumerate(vv):
            ip.add(rs[pp], v[k], 1); ip.add(re[qq], v[k], 1)
        rs = [mk(FX, 0, 0) for _ in range(n2)]
        re = [mk(FX, 0, 0) for _ in range(n2)]
        for i in range(n2):
            ip.add(rs[i], w_st[i], -1); ip.add(re[i], w_en[i], -1)
        for k, (pp, qq) in enumerate(ww):
            ip.add(rs[pp], w[k], 1); ip.add(re[qq], w[k], 1)

    if not acc:
        if st1_en:
            for i in range(n1):
                r = mk(LO, 1, 0)
                ip.add(r, x_un[i], 1); ip.add(r, z_un1[i], 1)
        if st2_en:
            for i in range(n2):
                r = mk(LO, 1, 0)
                ip.add(r, y_un[i], 1); ip.add(r, z_un2[i], 1)
    else:
        if st1_en:
            rows = [mk(UP, 0, 0) for _ in range(n1)]
            for i in range(n1): ip.add(rows[i], x_un[i], -1)
            for k, (pp, qq) in enumerate(vv):
                for i in range(pp, qq + 1): ip.add(rows[i], v[k], 1)
        rows = [mk(LO, 1, 0) for _ in range(n1)]
        for i in range(n1): ip.add(rows[i], z_un1[i], 1)
        for k, (pp, qq) in enumerate(vv):
            for i in range(pp, qq + 1): ip.add(rows[i], v[k], 1)
        if st2_en:
            rows = [mk(UP, 0, 0) for _ in range(n2)]
            for i in range(n2): ip.add(rows[i], y_un[i], -1)
            for k, (pp, qq) in enumerate(ww):
                for i in range(pp, qq + 1): ip.add(rows[i], w[k], 1)
        rows = [mk(LO, 1, 0) for _ in range(n2)]
        for i in range(n2): ip.add(rows[i], z_un2[i], 1)
        for k, (pp, qq) in enumerate(ww):
            for i in range(pp, qq + 1): ip.add(rows[i], w[k], 1)
        # one region per position (:894-924) + adjacency (:905-933)
        rows = [mk(UP, 0, 1) for _ in range(n1)]
        for k, (pp, qq) in enumerate(vv):
            for i in range(pp, qq + 1): ip.add(rows[i], v[k], 1)
        for i in range(1, n1):
            r = mk(UP, 0, 1)
            ip.add(r, v_en[i - 1], 1); ip.add(r, v_st[i], 1)
        rows = [mk(UP, 0, 1) for _ in range(n2)]
        for k, (pp, qq) in enumerate(ww):
            for i in range(pp, qq + 1): ip.add(rows[i], w[k], 1)
        for i in range(1, n2):
            r = mk(UP, 0, 1)
            ip.add(r, w_en[i - 1], 1); ip.add(r, w_st[i], 1)
        if cfg.beta > 0.0:
            for k, (pp, qq) in enumerate(vv):
                r = mk(UP, 0, qq - pp + 1)
                ip.add(r, v[k], 1)
                for i in range(pp, qq + 1): ip.add(r, z_un1[i], 1)
            for k, (pp, qq) in enumerate(ww):
                r = mk(UP, 0, qq - pp + 1)
                ip.add(r, w[k], 1)
                for i in range(pp, qq + 1): ip.add(r, z_un2[i], 1)
        if cfg.acc_num > 0:
            for _ in range(2):   # reference adds these rows twice (:971-994)
                r = mk(UP, 0, cfg.acc_num)
                for k in range(len(v)): ip.add(r, v[k], 1)
                r = mk(UP, 0, cfg.acc_num)
                for k in range(len(w)): ip.add(r, w[k], 1)

    # external pseudoknots (:996-1012)
    for i in range(n1):
        for k in range(i + 1, n1):
            for j in range(n2):
                if z[i, j] < 0: continue
                for l in range(n2):
                    if z[k, l] >= 0 and j < l:
                        r = mk(UP, 0, 1)
                        ip.add(r, z[i, j], 1); ip.add(r, z[k, l], 1)

    # internal pseudoknots (:1014-1057)
    if cfg.in_pk:
        for (s_en, n, m) in ((st1_en, n1, x), (st2_en, n2, y)):
            if not s_en: continue
            for i in range(n):
                for j in range(i + 1, n):
                    if m[i, j] < 0: continue
                    for k in range(i + 1, j):
                        for l in range(j + 1, n):
                            if m[k, l] >= 0:
                                r = mk(UP, 0, 1)
                                ip.add(r, m[i, j], 1); ip.add(r, m[k, l], 1)

    # stacking / no-isolated-pairs (:1059-1167)
    if cfg.stacking:
        for (s_en, n, m) in ((st1_en, n1, x), (st2_en, n2, y)):
            if not s_en: continue
            for i in range(n):
                r = mk(LO, 0, 0)
                for j in range(i):
                    if m[j, i] >= 0: ip.add(r, m[j, i], -1)
                if i > 0:
                    for j in range(i - 1):
                        if m[j, i - 1] >= 0: ip.add(r, m[j, i - 1], 1)
                if i + 1 < n:
                    for j in range(i + 1):
                        if m[j, i + 1] >= 0: ip.add(r, m[j, i + 1], 1)
            for i in range(n):
                r = mk(LO, 0, 0)
                for j in range(i + 1, n):
                    if m[i, j] >= 0: ip.add(r, m[i, j], -1)
                if i > 0:
                    for j in range(i, n):
                        if m[i - 1, j] >= 0: ip.add(r, m[i - 1, j], 1)
                if i + 1 < n:
                    for j in range(i + 2, n):
                        if m[i + 1, j] >= 0: ip.add(r, m[i + 1, j], 1)
        for i in range(n2):
            r = mk(LO, 0, 0)
            for j in range(n1):
                if z[j, i] >= 0: ip.add(r, z[j, i], -1)
            if i > 0:
                for j in range(n1):
                    if z[j, i - 1] >= 0: ip.add(r, z[j, i - 1], 1)
            if i + 1 < n2:
                for j in range(n1):
                    if z[j, i + 1] >= 0: ip.add(r, z[j, i + 1], 1)
        for i in range(n1):
            r = mk(LO, 0, 0)
            for j in range(n2):
                if z[i, j] >= 0: ip.add(r, z[i, j], -1)
            if i > 0:
                for j in range(n2):
                    if z[i - 1, j] >= 0: ip.add(r, z[i - 1, j], 1)
            if i + 1 < n1:
                for j in range(n2):
                    if z[i + 1, j] >= 0: ip.add(r, z[i + 1, j], 1)

    if cfg.force_constraint:
        for (i, j) in fx:
            if x[i, j] >= 0:
                r = mk(FX, 1, 1); ip.add(r, x[i, j], 1)
        for (i, j) in fy:
            if y[i, j] >= 0:
                r = mk(FX, 1, 1); ip.add(r, y[i, j], 1)
        for (i, j) in fz:
            if z[i, j] >= 0:
                r = mk(FX, 1, 1); ip.add(r, z[i, j], 1)

    obj, sol = ip.solve()
    return obj, {"x": x, "y": y, "z": z, "v": v, "vv": vv, "w": w, "ww": ww,
                 "sol": sol}
