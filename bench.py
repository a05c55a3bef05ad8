#!/usr/bin/env python
"""Headline benchmark: batched z-score decoy throughput (full pipelines/sec).

Workload = BASELINE.md config #4: dinucleotide-shuffled decoys of the
CopA x CopT pair, each decoy running the reference's *entire* per-instance
pipeline (McCaskill bpp x2 + cofold hybridization + accessibility DPs,
threshold sparsification, LP solve, integral repair, bracket decode) -- the
workload the reference executes sequentially 1000x in its z-score loop
(reference src/ractip.cpp:1624-1669).

The reference binary cannot be built in this image (no GLPK/ViennaRNA), so
`vs_baseline` reports the measured batching speedup: batched pipelines/sec
versus the same stack executed one instance per dispatch (the sequential
execution model of the reference).  Prints ONE JSON line.
"""

import json
import time

import numpy as np

BATCH = 128
SEQ_PROBE = 4
# the ACCURACY operating point (same solver budget as the corpus protocol in
# RESULTS.md), so throughput and accuracy are quoted from one configuration
ITERS = 4000


def main():
    from ractip_tpu.io.fasta import load_fasta
    from ractip_tpu.params.tables import get_default_params
    from ractip_tpu.pipeline.batched import predict_batch
    from ractip_tpu.pipeline.ractip import Options

    from ractip_tpu.pipeline.shuffle import dinuc_shuffle

    fa1 = load_fasta("/root/reference/data/CopA.fa")[0]
    fa2 = load_fasta("/root/reference/data/CopT.fa")[0]
    opts = Options()
    params = get_default_params()
    rng = np.random.default_rng(0)
    decoys = [(dinuc_shuffle(fa1.seq, rng), dinuc_shuffle(fa2.seq, rng))
              for _ in range(BATCH)]

    # compile both shapes
    predict_batch(params, decoys, opts, chunk=BATCH, iters=ITERS)
    predict_batch(params, decoys[:1], opts, chunk=1, iters=ITERS)

    t0 = time.perf_counter()
    res = predict_batch(params, decoys, opts, chunk=BATCH, iters=ITERS)
    t1 = time.perf_counter()
    batched_rate = BATCH / (t1 - t0)

    t0 = time.perf_counter()
    for d in decoys[:SEQ_PROBE]:
        predict_batch(params, [d], opts, chunk=1, iters=ITERS)
    t1 = time.perf_counter()
    seq_rate = SEQ_PROBE / (t1 - t0)

    assert float(np.max(res.violation)) < 0.5, "infeasible decoy solutions"
    print(json.dumps({
        "metric": "zscore_decoy_pipelines_per_sec",
        "value": round(batched_rate, 3),
        "unit": "pipelines/s",
        "vs_baseline": round(batched_rate / seq_rate, 2),
    }))


if __name__ == "__main__":
    main()
