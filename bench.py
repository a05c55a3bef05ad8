#!/usr/bin/env python
"""Headline benchmark: batched z-score decoy throughput (full pipelines/sec).

Workload = BASELINE.md config #4: dinucleotide-shuffled decoys of the
CopA x CopT pair, each decoy running the reference's *entire* per-instance
pipeline (McCaskill bpp x2 + cofold hybridization + accessibility DPs,
threshold sparsification, LP solve, integral repair, bracket decode) -- the
workload the reference executes sequentially 1000x in its z-score loop
(reference src/ractip.cpp:1624-1669).  All solutions are CERTIFIED exact
(exact_gap_tol=1e-4, the predict_batch default): any instance whose device
objective trails the LP bound re-solves on the host branch-and-bound,
matching the reference's glp_intopt exactness (src/ip.cpp:112-122).

The reference binary cannot be built in this image (no GLPK/ViennaRNA), so
`vs_baseline` reports throughput versus the sequential execution model the
reference uses (one full pipeline per dispatch), measured ONCE on this
hardware/stack at the same operating point and pinned below -- a fixed
denominator, so the ratio tracks real improvements instead of shrinking as
the sequential probe speeds up too.  Extra keys carry the DP-kernel
GCUPS/chip at the bench shape (BASELINE.json's primary kernel metric).
Prints ONE JSON line.
"""

import os
import json
import time

import numpy as np

BATCH = 128
ITERS = 4000
# Sequential execution model (reference-style, one instance per dispatch):
# 7.87 pipelines/s measured round 3 on this TPU v5e at iters=4000 (the
# 88.523 / 11.24 probe of BENCH_r03.json).  Pinned so vs_baseline is
# comparable across rounds.
SEQ_MODEL_RATE = 7.87


def _gcups():
    """DP-kernel throughput at the bench shapes (cells = n^3/2 updates).

    The tunneled device link of this sandbox costs ~30 ms per dispatch --
    comparable to the whole kernel at these tiny-n shapes and absent in the
    production pipeline (one dispatch per CHUNK of hundreds of instances,
    pipeline.batched).  So the kernel rate is measured as the SLOPE between
    K1 and K2 scanned applications inside one jit: per-application time net
    of the fixed dispatch/transfer cost."""
    import jax
    import jax.numpy as jnp
    from ractip_tpu.ops import cofold_pallas as cp
    from ractip_tpu.ops import scan_pallas as sp
    from ractip_tpu.ops.seq import encode
    from ractip_tpu.params.tables import get_default_params

    params = get_default_params()
    rng = np.random.default_rng(1)
    interp = jax.default_backend() == "cpu"
    out = {}
    K1, K2 = (2, 10) if not interp else (1, 2)

    def mkseqs(B, n, L):
        seqs = ["".join(rng.choice(list("ACGU"), n)) for _ in range(B)]
        return np.stack([encode(s, L) for s in seqs])

    def slope(mk_fn, *argsets):
        """Per-application seconds: (t[K2] - t[K1]) / (K2 - K1), best of 3."""
        ts = {}
        for K in (K1, K2):
            fn = mk_fn(K)
            args = argsets[:1][0](K)
            np.asarray(fn(*args))        # compile + warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        return max((ts[K2] - ts[K1]) / (K2 - K1), 1e-9)

    B, n = (BATCH, 70) if not interp else (8, 24)
    L = 96 if not interp else 32
    m = jnp.full(B, n, jnp.int32)

    def mk_fold(K):
        @jax.jit
        def f(Ss, m):
            def body(acc, S):
                r = sp.batch_fold(params, S, m, interpret=interp)["bpp"]
                return acc + jnp.sum(r, axis=(1, 2)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), Ss)
            return acc
        return f

    fold_args = lambda K: (jnp.asarray(
        np.stack([mkseqs(B, n, L) for _ in range(K)])), m)
    t = slope(mk_fold, fold_args)
    out["mccaskill_gcups"] = round(B * n**3 / 2 / t / 1e9, 3)

    def mk_cof(K):
        @jax.jit
        def f(S1s, S2s, m1, m2):
            def body(acc, Ss):
                r = cp.batch_cofold(params, Ss[0], Ss[1], m1, m2,
                                    interpret=interp)["hp"]
                return acc + jnp.sum(r, axis=(1, 2)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32),
                                  (S1s, S2s))
            return acc
        return f

    cof_args = lambda K: (
        jnp.asarray(np.stack([mkseqs(B, n, L) for _ in range(K)])),
        jnp.asarray(np.stack([mkseqs(B, n, L) for _ in range(K)])), m, m)
    t = slope(mk_cof, cof_args)
    out["cofold_gcups"] = round(B * (2 * n)**3 / 2 / t / 1e9, 3)
    return out


def main():
    from ractip_tpu.io.fasta import load_fasta
    from ractip_tpu.evaluate.corpus import data_dir_default
    from ractip_tpu.params.tables import get_default_params
    from ractip_tpu.pipeline.batched import predict_batch
    from ractip_tpu.pipeline.ractip import Options

    from ractip_tpu.pipeline.shuffle import dinuc_shuffle

    fa1 = load_fasta(os.path.join(data_dir_default(), "CopA.fa"))[0]
    fa2 = load_fasta(os.path.join(data_dir_default(), "CopT.fa"))[0]
    opts = Options()
    params = get_default_params()
    rng = np.random.default_rng(0)
    decoys = [(dinuc_shuffle(fa1.seq, rng), dinuc_shuffle(fa2.seq, rng))
              for _ in range(BATCH)]

    # compile
    predict_batch(params, decoys, opts, chunk=BATCH, iters=ITERS)

    t0 = time.perf_counter()
    res = predict_batch(params, decoys, opts, chunk=BATCH, iters=ITERS)
    t1 = time.perf_counter()
    batched_rate = BATCH / (t1 - t0)

    assert float(np.max(res.violation)) < 0.5, "infeasible decoy solutions"
    assert float(np.max(res.bound - res.objective)) <= 1e-3, \
        "uncertified decoy solutions"
    rec = {
        "metric": "zscore_decoy_pipelines_per_sec",
        "value": round(batched_rate, 3),
        "unit": "pipelines/s",
        "vs_baseline": round(batched_rate / SEQ_MODEL_RATE, 2),
    }
    rec.update(_gcups())
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
