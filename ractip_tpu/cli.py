"""RactIP-compatible command-line interface.

Flag surface mirrors the reference's gengetopt spec (reference src/ractip.ggo:
7-58) and the output format mirrors RactIP::run (reference src/ractip.cpp:
1605-1669): FASTA headers + sequences + dot-bracket rows, an optional
`(E: JS= ...)` energy line, and an optional `z-score: z1, z2` line.

TPU-native extensions:
  --batch       run the z-score decoy sweep batched on device (default);
                --no-batch falls back to the reference's sequential loop
                through the exact host branch-and-bound path.
  --chunk       device batch chunk size for the decoy sweep.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .io.fasta import load_fasta
from .params.tables import get_default_params
from .pipeline.ractip import Options, predict
from .pipeline import batched


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="ractip-tpu",
        description="RactIP-TPU: RNA-RNA interaction prediction "
                    "(TPU-native reimplementation of RactIP).")
    ap.add_argument("fasta", nargs="+",
                    help="two FASTA files, or one FASTA with two records")
    ap.add_argument("-a", "--alpha", type=float, default=0.7,
                    help="weight for hybridization")
    ap.add_argument("-b", "--beta", type=float, default=0.0,
                    help="weight for accessibility")
    ap.add_argument("-t", "--fold-th", type=float, default=0.5,
                    help="threshold for base-pairing probabilities")
    ap.add_argument("-u", "--hybridize-th", type=float, default=0.1,
                    help="threshold for hybridization probabilities")
    ap.add_argument("-s", "--acc-th", type=float, default=0.003,
                    help="threshold for accessible probabilities")
    ap.add_argument("--acc-max", action="store_true",
                    help="optimize for accessibility instead of internal "
                         "secondary structures")
    ap.add_argument("--acc-max-ss", action="store_true",
                    help="additional prediction of internal secondary "
                         "structures")
    ap.add_argument("--acc-num", type=int, default=1,
                    help="the number of accessible regions (0=unlimited)")
    ap.add_argument("--max-w", type=int, default=15,
                    help="maximum length of accessible regions")
    ap.add_argument("--min-w", type=int, default=5,
                    help="minimum length of accessible regions")
    ap.add_argument("--zscore", type=int, default=0, choices=(0, 1, 2, 12),
                    help="z-score via dishuffling (1=1st, 2=2nd, 12=both)")
    ap.add_argument("--num-shuffling", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-c", "--use-constraint", action="store_true",
                    help="use structure constraints")
    ap.add_argument("--force-constraint", action="store_true",
                    help="enforce structure constraints")
    ap.add_argument("--allow-isolated", action="store_true",
                    help="allow isolated base-pairs")
    ap.add_argument("-e", "--show-energy", action="store_true",
                    help="free energy of the predicted joint structure")
    ap.add_argument("-P", "--param-file", type=str, default=None,
                    help="energy parameter file (Vienna format)")
    ap.add_argument("--no-pk", action="store_true",
                    help="no constraints for internal pseudoknots")
    ap.add_argument("-r", "--rip", type=str, default=None,
                    help="import posterior probabilities from a RIP result")
    ap.add_argument("--duplex", action="store_true",
                    help="use the pure-duplex hybridization model")
    ap.add_argument("--contrafold", action="store_true",
                    help="use the CONTRAfold learned-CRF scoring model "
                         "for folding/accessibility (hybridization stays "
                         "on the cofold ensemble, matching the reference's "
                         "latent path); with default --min-w this mode "
                         "cannot emit external pairs -- pass --min-w 1")
    ap.add_argument("--contraduplex", action="store_true",
                    help="extension: score hybridization with the CRF "
                         "DuplexEngine (the reference ships this engine "
                         "but never calls it); implies --contrafold")
    ap.add_argument("--no-bl", action="store_true",
                    help="do not use BL parameters")
    ap.add_argument("--batch", dest="batch", action="store_true", default=True,
                    help="batch the z-score sweep on device (default)")
    ap.add_argument("--no-batch", dest="batch", action="store_false")
    ap.add_argument("--chunk", type=int, default=256,
                    help="device batch chunk size")
    ap.add_argument("--ckpt-dir", type=str, default=None, metavar="DIR",
                    help="checkpoint directory for the batched decoy sweep; "
                         "a killed run resumes after the last completed "
                         "chunk")
    ap.add_argument("--exact-gap-tol", type=float, default=1e-4,
                    metavar="TOL",
                    help="certified-exactness tolerance on the batched "
                         "path: instances whose device objective trails "
                         "the LP bound by more than TOL re-solve on the "
                         "exact host branch-and-bound (<=0 disables, "
                         "accepting uncertified device solutions)")
    ap.add_argument("--mesh", dest="mesh", action="store_true", default=True,
                    help="shard batched sweeps over all visible devices "
                         "(default; single-device runs are unaffected)")
    ap.add_argument("--no-mesh", dest="mesh", action="store_false")
    ap.add_argument("--timings", action="store_true",
                    help="print per-stage wall times to stderr")
    ap.add_argument("--records", type=str, default=None, metavar="PATH",
                    help="append a structured JSONL result record to PATH")
    return ap


def options_from_args(args) -> Options:
    return Options(
        alpha=args.alpha, beta=args.beta, th_ss=args.fold_th,
        th_hy=args.hybridize_th, th_ac=args.acc_th,
        max_w=args.max_w, min_w=args.min_w, acc_num=args.acc_num,
        acc_max=args.acc_max, acc_max_ss=args.acc_max_ss,
        in_pk=not args.no_pk, stacking=not args.allow_isolated,
        force_constraint=args.force_constraint,
        zscore=args.zscore, num_shuffling=args.num_shuffling,
        seed=args.seed, show_energy=args.show_energy,
        use_constraint=args.use_constraint, use_pf_duplex=args.duplex,
        use_contrafold=args.contrafold,
        use_contraduplex=args.contraduplex)


def _fmt_sum(parts: list[float]) -> str:
    out = f"{parts[0]:g}"
    for p in parts[1:]:
        out += ("+" if p >= 0 else "") + f"{p:g}"
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.no_bl and not args.param_file:
        # The reference's --no-bl leaves ViennaRNA's built-in Turner tables
        # in place (src/ractip.cpp:1498,1566); those tables live in the
        # external Vienna LIBRARY, not in the reference repo, so this
        # standalone framework cannot ship them.  A complete Vienna-format
        # parameter dump (e.g. rna_turner2004.par, distributed with
        # ViennaRNA) via -P reproduces the behavior exactly: with --no-bl
        # the file is applied INSTEAD of the BL* set.
        print("ractip-tpu: --no-bl needs -P <file> with a complete "
              "Vienna-format parameter dump (e.g. rna_turner2004.par); "
              "the Turner tables are ViennaRNA library data and are not "
              "bundled here", file=sys.stderr)
        return 1
    if len(args.fasta) >= 2:
        fa1 = load_fasta(args.fasta[0])[0]
        fa2 = load_fasta(args.fasta[1])[0]
    else:
        recs = load_fasta(args.fasta[0])
        if len(recs) < 2:
            print(f"{args.fasta[0]}: Format error", file=sys.stderr)
            return 1
        fa1, fa2 = recs[0], recs[1]

    opts = options_from_args(args)
    params = get_default_params()
    if args.param_file:
        # reference: Vienna::read_parameter_file overrides the (BL*-patched)
        # global tables section by section (src/ractip.cpp:1565-1569)
        from .params.vienna_par import load_param_file, parse_par
        if args.no_bl:
            # --no-bl: the file must be a complete dump -- any section it
            # omits silently keeps the BL* values, which is NOT the
            # reference's Turner-default behavior; surface that
            core = {"stack", "mismatch_h", "mismatch_i", "dangle5",
                    "dangle3", "int11", "int21", "int22", "hairpin",
                    "bulge", "internal", "ml", "ninio", "misc"}
            with open(args.param_file) as fh:
                present = set(parse_par(fh.read()).tables)
            missing = sorted(core - present)
            if missing:
                print(f"ractip-tpu: --no-bl: {args.param_file} does not "
                      f"define {', '.join(missing)}; those sections keep "
                      "BL* values", file=sys.stderr)
        params = load_param_file(args.param_file, params)

    if args.rip:
        # external probability source; no accessibility tables available
        from .io.rip import load_rip
        from .pipeline.ractip import Posteriors, solve_pair
        import dataclasses as _dc
        opts = _dc.replace(opts, max_w=0, min_w=0)
        bp1, bp2, hp = load_rip(args.rip, len(fa1.seq), len(fa2.seq))
        post = Posteriors.from_matrices(bp1, bp2, hp)
        r1, r2, _obj, _, _ = solve_pair(params, fa1, fa2, opts, post=post)
        print(f">{fa1.name}\n{fa1.seq}\n{r1}")
        print(f">{fa2.name}\n{fa2.seq}\n{r2}")
        return 0

    # the batched device path does not carry constraint masks or the
    # CONTRAfold model; silently dropping -c/--contrafold there would
    # diverge from the reference (which honors -c in z-score runs), so
    # those flags route through the exact non-batched path instead.
    can_batch = (args.batch and not opts.use_contrafold
                 and not opts.use_contraduplex and not (
                     opts.use_constraint and (fa1.str_ or fa2.str_)))
    if args.zscore in (1, 2, 12) and args.batch and not can_batch:
        print("ractip-tpu: -c/--contrafold not supported on the batched "
              "z-score path; falling back to the sequential path",
              file=sys.stderr)
    from .utils.timing import StageTimer
    timer = StageTimer() if args.timings else None

    def _emit(r1, r2, objective=None, energies=None, zscore=None):
        if args.records:
            from .utils.records import PairRecord, write_records
            rec = PairRecord(
                name1=fa1.name, name2=fa2.name, seq1=fa1.seq, seq2=fa2.seq,
                r1=r1, r2=r2, objective=objective, energies=energies,
                zscore=zscore,
                timings=timer.report() if timer else None)
            write_records(args.records, [rec], append=True)
        if timer:
            print(f"timings: {timer.json()}", file=sys.stderr)

    if args.zscore in (1, 2, 12) and can_batch:
        # multi-device/multi-host: initialize jax.distributed when a
        # coordinator is configured (JAX_COORDINATOR/NPROC/PROC_ID, see
        # parallel.distributed), then shard the decoy sweep over a
        # (pairs, replicates) scenario mesh when >1 device is visible.
        mesh = None
        if args.mesh:
            import jax
            from .parallel import init_distributed, scenario_mesh
            init_distributed()
            if len(jax.devices()) > 1:
                mesh = scenario_mesh()
        gap_tol = args.exact_gap_tol if args.exact_gap_tol > 0 else None
        z, zs, stats = batched.zscore_batch(
            fa1, fa2, opts, params, chunk=args.chunk, mesh=mesh,
            ckpt_dir=args.ckpt_dir, exact_gap_tol=gap_tol, timer=timer)
        r1, r2 = stats["brackets"]
        print(f">{fa1.name}\n{fa1.seq}\n{r1}")
        print(f">{fa2.name}\n{fa2.seq}\n{r2}")
        if args.show_energy:
            print(f"(E: JS= {stats['e']:g}, JS-S1-S2= {stats['es']:g})")
        print(f"z-score: {z:g}, {zs:g}")
        _emit(r1, r2, energies=dict(e=float(stats["e"]),
                                    es=float(stats["es"])),
              zscore=(float(z), float(zs)))
        return 0

    if timer is not None:
        cm = timer("predict")
        cm.__enter__()
    pred = predict(fa1, fa2, opts, params)
    if timer is not None:
        cm.__exit__(None, None, None)
    print(f">{fa1.name}\n{fa1.seq}\n{pred.r1}")
    print(f">{fa2.name}\n{fa2.seq}\n{pred.r2}")
    if args.show_energy:
        js = pred.e1 + pred.e2 + pred.e3
        ss = pred.e1s + pred.e2s
        print(f"(E: JS= {js:g} = {_fmt_sum([pred.e1, pred.e2, pred.e3])}, "
              f"S1+S2= {ss:g} = {_fmt_sum([pred.e1s, pred.e2s])})")
    if pred.zscore is not None:
        print(f"z-score: {pred.zscore[0]:g}, {pred.zscore[1]:g}")
    ee = None
    if pred.e1 is not None:
        ee = dict(e1=pred.e1, e2=pred.e2, e3=pred.e3, e1s=pred.e1s,
                  e2s=pred.e2s)
    _emit(pred.r1, pred.r2, objective=float(pred.objective), energies=ee,
          zscore=pred.zscore)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
