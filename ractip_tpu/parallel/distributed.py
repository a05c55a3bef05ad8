"""Multi-host initialization for pod-scale sweeps.

The reference is a single-process binary (reference src/ractip.cpp:1494); the
TPU framework scales batch workloads over pods by initializing
jax.distributed and building the scenario mesh over EVERY process's devices.
ICI carries the intra-slice scenario shards; DCN only sees the tiny psum
reductions (z-score mean/variance, F-measure totals).

Pod recipe (one command per host):

    JAX_COORDINATOR=host0:8476 NPROC=8 PROC_ID=$i python -m ractip_tpu.cli \
        --zscore=12 a.fa b.fa

or programmatically:

    from ractip_tpu.parallel import init_distributed, scenario_mesh
    init_distributed()                       # no-op on a single host
    mesh = scenario_mesh()                   # all global devices
    predict_batch(..., mesh=mesh)

Every process must execute the same predict_batch calls (standard JAX SPMD
multi-controller semantics); each host feeds the full global batch and XLA
keeps only its shard's work.
"""

from __future__ import annotations

import os

_initialized = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or JAX_COORDINATOR/NPROC/PROC_ID.

    Returns True when a multi-process runtime was initialized, False when
    running single-host (no coordinator configured) -- callers can use the
    same code path either way.  Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ.get("NPROC", "1"))
    process_id = process_id if process_id is not None \
        else int(os.environ.get("PROC_ID", "0"))
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True
