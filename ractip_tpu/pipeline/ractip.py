"""End-to-end RNA-RNA interaction prediction pipeline.

Mirrors the reference driver's control flow (reference src/ractip.cpp:
run() :1561-1674, solve() :516-1353, solve_ss() :1366-1465) on the TPU-native
stack: posterior matrices from the ops DP engines, joint-structure
optimization from the native PDHG+B&B solver, dot-bracket decode, scalar
energy evaluation, and the z-score shuffling loop.

Probability sources:
  bpp  -- ops.mccaskill (reference: Vienna pf_fold w/ BL* params, :248-306)
  hyb  -- ops.cofold by default (reference: co_pf_fold cross-cut posteriors,
          :442-453); ops.duplex when use_pf_duplex (hidden --duplex flag)
  acc  -- ops.accessibility (reference: Vienna pf_unstru, :308-382)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..io.fasta import Fasta
from ..ops import constraints, eos
from ..ops.accessibility import accessibility
from ..ops.cofold import cofold_hybrid_probs
from ..ops.duplex import hybrid_probs
from ..ops.mccaskill import base_pair_probs
from ..ops.seq import bucket_length, encode
from ..params.tables import EnergyParams, get_default_params
from ..solver import SolverConfig, build_problem
from ..solver.milp import exact_solve as solve_joint
from ..solver.candidates import JointProblem
from .shuffle import dinuc_shuffle


@dataclasses.dataclass(frozen=True)
class Options(SolverConfig):
    """SolverConfig + driver options (reference src/ractip.ggo)."""

    zscore: int = 0                 # 0 | 1 | 2 | 12
    num_shuffling: int = 1000
    seed: int = 0
    show_energy: bool = False
    use_constraint: bool = False
    use_pf_duplex: bool = False     # hidden --duplex flag: pure-duplex model
    use_contrafold: bool = False    # --contrafold: learned-CRF scoring model
    # --contraduplex (extension): hybridization from the CRF DuplexEngine.
    # The reference's contraduplex() call is commented out in its own driver
    # (reference src/ractip.cpp:539-541: `//contraduplex(...); rnaduplex(...)`)
    # so --contrafold there still scores hybridization with the cofold
    # ensemble; this flag enables the engine the reference ships but never
    # calls.  Implies use_contrafold semantics for bpp/accessibility.
    use_contraduplex: bool = False

    def solver_cfg(self) -> SolverConfig:
        return SolverConfig(**{f.name: getattr(self, f.name)
                               for f in dataclasses.fields(SolverConfig)})


@dataclasses.dataclass
class Prediction:
    r1: str
    r2: str
    objective: float
    e1: float | None = None         # free energy, structure 1
    e2: float | None = None
    e3: float | None = None         # hybridization free energy
    e1s: float | None = None        # independent secondary-structure energies
    e2s: float | None = None
    zscore: tuple[float, float] | None = None


class Posteriors:
    """The three probability matrices for one sequence pair."""

    def __init__(self, params: EnergyParams, s1: str, s2: str,
                 max_w: int, need_acc: bool, dtype=jnp.float32,
                 use_pf_duplex: bool = False,
                 cstr1: str | None = None, cstr2: str | None = None,
                 use_contrafold: bool = False,
                 use_contraduplex: bool = False):
        self.n1, self.n2 = len(s1), len(s2)
        self.L1, self.L2 = bucket_length(self.n1), bucket_length(self.n2)
        S1 = jnp.asarray(encode(s1, self.L1))
        S2 = jnp.asarray(encode(s2, self.L2))
        n1, n2 = jnp.int32(self.n1), jnp.int32(self.n2)
        if use_contrafold or use_contraduplex:
            # --contrafold: learned-CRF probability source (reference
            # src/ractip.cpp:195-246 contrafold()/contraduplex(), latent
            # behind #ifdef USE_CONTRAFOLD).  Accessibility is the driver's
            # width-1 proxy up[i] = max(0, 1 - sum_j bp(i,j)) (:213-222).
            # NOTE on hybridization parity: the reference's own driver has
            # the contraduplex() call commented out (:539-541) and scores
            # hybridization with rnaduplex (cofold cross-cut posteriors,
            # or pf_duplex under the hidden --duplex flag) even under
            # --contrafold; only bpp/accessibility come from the CRF.  We
            # reproduce that, and expose the shipped-but-never-called CRF
            # DuplexEngine behind the explicit use_contraduplex flag.
            from ..ops.contrafold import cf_base_pair_probs, cf_unpaired_probs
            self.bpp1 = np.asarray(cf_base_pair_probs(S1, n1))
            self.bpp2 = np.asarray(cf_base_pair_probs(S2, n2))
            if use_contraduplex:
                from ..ops.contraduplex import cd_hybrid_probs
                self.hp = np.asarray(cd_hybrid_probs(S1, S2, n1, n2))
            elif use_pf_duplex:
                self.hp = np.asarray(
                    hybrid_probs(params, S1, S2, n1, n2, dtype))
            else:
                self.hp = np.asarray(cofold_hybrid_probs(
                    params, S1, S2, n1, n2, dtype))
            if need_acc:
                w = max(1, max_w)
                pu1 = np.zeros((self.L1, w + 1), np.float64)
                pu2 = np.zeros((self.L2, w + 1), np.float64)
                pu1[:, 1] = np.asarray(cf_unpaired_probs(self.bpp1))
                pu2[:, 1] = np.asarray(cf_unpaired_probs(self.bpp2))
                self.pu1, self.pu2 = pu1, pu2
            else:
                self.pu1 = self.pu2 = None
            return
        # -c/--use-constraint: pf-level hard-constraint masks from the FASTA
        # constraint strings (reference src/ractip.cpp:270-290, :403-444)
        al1 = constraints.fold_allow(cstr1, self.n1, self.L1)
        al2 = constraints.fold_allow(cstr2, self.n2, self.L2)
        alc = constraints.cofold_allow(cstr1, cstr2, self.n1, self.n2,
                                       self.L1 + self.L2)
        self.bpp1 = np.asarray(base_pair_probs(params, S1, n1, dtype,
                                               allow=al1))
        self.bpp2 = np.asarray(base_pair_probs(params, S2, n2, dtype,
                                               allow=al2))
        if use_pf_duplex:
            # reference: the pf_duplex path ignores constraints (:390-399)
            self.hp = np.asarray(hybrid_probs(params, S1, S2, n1, n2, dtype))
        else:
            self.hp = np.asarray(cofold_hybrid_probs(
                params, S1, S2, n1, n2, dtype, allow=alc))
        if need_acc:
            # reference parity: pf_unstru runs UNCONSTRAINED -- it is called
            # after fold_constrained is restored and takes no constraint
            # string (reference src/ractip.cpp:369-375), so -c must not
            # shape the accessibility posteriors.
            w = max(1, max_w)
            self.pu1 = np.asarray(accessibility(params, S1, n1, w, dtype))
            self.pu2 = np.asarray(accessibility(params, S2, n2, w, dtype))
        else:
            self.pu1 = self.pu2 = None

    @classmethod
    def from_matrices(cls, bpp1, bpp2, hp, pu1=None, pu2=None):
        """External probability source (e.g. io.rip tables, reference
        src/ractip.cpp:461-514); accessibility defaults to unavailable."""
        self = cls.__new__(cls)
        self.n1, self.n2 = bpp1.shape[0], bpp2.shape[0]
        self.L1, self.L2 = bucket_length(self.n1), bucket_length(self.n2)
        self.bpp1, self.bpp2, self.hp = (np.asarray(bpp1), np.asarray(bpp2),
                                         np.asarray(hp))
        self.pu1, self.pu2 = pu1, pu2
        return self


def _decode(prob: JointProblem, u, n1: int, n2: int, in_pk: bool):
    r1, r2 = ["."] * n1, ["."] * n2
    zi, zj = np.asarray(prob.zi), np.asarray(prob.zj)
    for k in np.where(u[2] > 0.5)[0]:
        r1[zi[k]] = "["
        r2[zj[k]] = "]"
    if in_pk:
        xi, xj = np.asarray(prob.xi), np.asarray(prob.xj)
        for k in np.where(u[0] > 0.5)[0]:
            assert r1[xi[k]] == "." and r1[xj[k]] == "."
            r1[xi[k]] = "("
            r1[xj[k]] = ")"
        yi, yj = np.asarray(prob.yi), np.asarray(prob.yj)
        for k in np.where(u[1] > 0.5)[0]:
            assert r2[yi[k]] == "." and r2[yj[k]] == "."
            r2[yi[k]] = "("
            r2[yj[k]] = ")"
    return "".join(r1), "".join(r2)


def _chosen_regions(prob: JointProblem, uk, which: str):
    p = np.asarray(getattr(prob, which + "p"))
    q = np.asarray(getattr(prob, which + "q"))
    return [(int(p[k]), int(q[k])) for k in np.where(uk > 0.5)[0]]


def solve_pair(params: EnergyParams, fa1: Fasta, fa2: Fasta, opts: Options,
               post: Posteriors | None = None, want_energy: bool = False):
    """The reference's RactIP::solve.  Returns (r1, r2, obj, (e1,e2,e3), post)."""
    cfg = opts.solver_cfg()
    if post is None:
        post = Posteriors(params, fa1.seq, fa2.seq, opts.max_w,
                          cfg.accessibility,
                          use_pf_duplex=opts.use_pf_duplex,
                          cstr1=fa1.str_ if opts.use_constraint else None,
                          cstr2=fa2.str_ if opts.use_constraint else None,
                          use_contrafold=opts.use_contrafold,
                          use_contraduplex=opts.use_contraduplex)
    n1, n2 = post.n1, post.n2
    prob = build_problem(post.bpp1, post.bpp2, post.hp, post.pu1, post.pu2,
                         n1, n2, cfg, fa1.str_, fa2.str_)
    u, obj, _bound, _nodes = solve_joint(prob, cfg, post.L1, post.L2)
    r1, r2 = _decode(prob, u, n1, n2, cfg.in_pk and cfg.structure)

    e1 = e2 = e3 = None
    S1, S2 = encode(fa1.seq), encode(fa2.seq)
    if want_energy:
        # ops energies are in dekacal/mol; report kcal/mol like the reference
        e3 = eos.duplex_structure_energy(params, S1, S2, r1, r2) / 100.0
        kt = (params.temperature + 273.15) * 1.98717 / 1000.0
        if cfg.structure:
            e1 = eos.structure_energy(
                params, S1, eos.parse_pairs(r1)) / 100.0
            e2 = eos.structure_energy(
                params, S2, eos.parse_pairs(r2)) / 100.0
        else:
            # accessibility energy: -kT log up over chosen regions (:1272-1283)
            e1 = sum(-np.log(post.pu1[p, q - p + 1]) * kt
                     for p, q in _chosen_regions(prob, u[3], "v"))
            e2 = sum(-np.log(post.pu2[p, q - p + 1]) * kt
                     for p, q in _chosen_regions(prob, u[4], "w"))

    if cfg.acc_max and cfg.acc_max_ss:
        # re-fold the non-accessible remainder (:1263-1271, :1308-1316)
        keep1 = np.ones(n1, bool)
        for p, q in _chosen_regions(prob, u[3], "v"):
            keep1[p: q + 1] = False
        keep2 = np.ones(n2, bool)
        for p, q in _chosen_regions(prob, u[4], "w"):
            keep2[p: q + 1] = False
        r1s, obj1, _ = solve_ss(params, fa1.seq, opts, post.bpp1,
                                allowed=keep1, L=post.L1)
        r2s, obj2, _ = solve_ss(params, fa2.seq, opts, post.bpp2,
                                allowed=keep2, L=post.L2)
        obj += obj1 + obj2
        r1 = "".join(a if a != "." else b for a, b in zip(r1, r1s))
        r2 = "".join(a if a != "." else b for a, b in zip(r2, r2s))

    return r1, r2, obj, (e1, e2, e3), post


def solve_ss(params: EnergyParams, s: str, opts: Options,
             bpp: np.ndarray | None = None,
             allowed: np.ndarray | None = None, L: int | None = None,
             want_energy: bool = False):
    """Secondary-structure-only optimization (reference solve_ss :1366-1465):
    x variables only, at-most-one-pairing + optional stacking rows; NO
    pseudoknot exclusion (faithful to the reference model)."""
    n = len(s)
    L = L or bucket_length(n)
    if bpp is None:
        bpp = np.asarray(base_pair_probs(
            params, jnp.asarray(encode(s, L)), jnp.int32(n)))
    if allowed is not None:
        bpp = bpp * np.outer(allowed, allowed)
    cfg = SolverConfig(min_w=0, max_w=0, in_pk=False,
                       stacking=opts.stacking, th_ss=opts.th_ss)
    prob = build_problem(bpp, np.zeros((1, 1)), np.zeros((n, 1)),
                         None, None, n, 1, cfg)
    u, obj, _bound, _nodes = solve_joint(prob, cfg, L, 8)
    r = ["."] * n
    xi, xj = np.asarray(prob.xi), np.asarray(prob.xj)
    for k in np.where(u[0] > 0.5)[0]:
        assert r[xi[k]] == "." and r[xj[k]] == "."
        r[xi[k]] = "("
        r[xj[k]] = ")"
    r = "".join(r)
    e = None
    if want_energy:
        e = eos.structure_energy(params, encode(s), eos.parse_pairs(r)) / 100.0
    return r, obj, e


def predict(fa1: Fasta, fa2: Fasta, opts: Options | None = None,
            params: EnergyParams | None = None) -> Prediction:
    """The reference's run(): predict, optionally with energies + z-score."""
    opts = opts or Options()
    params = params or get_default_params()
    want_e = opts.show_energy or opts.zscore in (1, 2, 12)

    r1, r2, obj, (e1, e2, e3), post = solve_pair(
        params, fa1, fa2, opts, want_energy=want_e)
    pred = Prediction(r1=r1, r2=r2, objective=obj, e1=e1, e2=e2, e3=e3)

    if want_e:
        _, _, pred.e1s = solve_ss(params, fa1.seq, opts, post.bpp1,
                                  L=post.L1, want_energy=True)
        _, _, pred.e2s = solve_ss(params, fa2.seq, opts, post.bpp2,
                                  L=post.L2, want_energy=True)

    if opts.zscore in (1, 2, 12):
        rng = np.random.default_rng(opts.seed if opts.seed else None)
        e = pred.e1 + pred.e2 + pred.e3
        es = e - pred.e1s - pred.e2s
        s1, s2 = fa1.seq, fa2.seq
        acc = np.zeros(2)
        acc2 = np.zeros(2)
        for _ in range(opts.num_shuffling):
            t1 = dinuc_shuffle(s1, rng) if opts.zscore in (1, 12) else s1
            t2 = dinuc_shuffle(s2, rng) if opts.zscore in (2, 12) else s2
            _, _, _, (ee1, ee2, ee3), spost = solve_pair(
                params, Fasta("s1", t1), Fasta("s2", t2), opts,
                want_energy=True)
            _, _, ee1s = solve_ss(params, t1, opts, spost.bpp1,
                                  L=spost.L1, want_energy=True)
            _, _, ee2s = solve_ss(params, t2, opts, spost.bpp2,
                                  L=spost.L2, want_energy=True)
            ee = ee1 + ee2 + ee3
            ees = ee - ee1s - ee2s
            acc += (ee, ee * ee)
            acc2 += (ees, ees * ees)
        m, m2 = acc / opts.num_shuffling
        v = max(m2 - m * m, 0.0)
        ms, ms2 = acc2 / opts.num_shuffling
        vs = max(ms2 - ms * ms, 0.0)
        pred.zscore = ((e - m) / np.sqrt(v) if v else np.inf,
                       (es - ms) / np.sqrt(vs) if vs else np.inf)
    return pred
