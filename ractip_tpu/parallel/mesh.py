"""Device-mesh batch parallelism for scenario sweeps.

The reference is a single-thread CPU binary (reference src/ractip.cpp:1494:
n_th fixed to 1); its batch workloads (1000-decoy z-score loops, corpus
sweeps) re-run the pipeline sequentially.  Scale here comes from sharding the
*scenario axis* over a `jax.sharding.Mesh`: every instance's whole pipeline is
independent, so the batched jit (pipeline.batched.predict_device) partitions
cleanly when its batch inputs carry a NamedSharding, with XLA inserting no
communication in the hot path and `psum` collectives only in the tiny
reduction stage (z-score mean/variance, corpus F-measure accumulation).

Two mesh axes are exposed:
  "pairs"      -- distinct sequence pairs (data parallelism across problems)
  "replicates" -- shuffle decoys of one pair (the z-score null model)
Both shard the flattened scenario axis; the split is organizational (ICI
topology placement), the math is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXES = ("pairs", "replicates")


def scenario_mesh(n_devices: int | None = None,
                  replicate_parallel: int | None = None) -> Mesh:
    """A (pairs, replicates) mesh over the first n_devices devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    r = replicate_parallel or (2 if n % 2 == 0 and n > 1 else 1)
    return Mesh(devs.reshape(n // r, r), SCENARIO_AXES)


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading scenario axis over both mesh axes."""
    return NamedSharding(mesh, P(SCENARIO_AXES))


def pad_to_mesh(B: int, mesh: Mesh) -> int:
    """Scenario count padded up to a multiple of the mesh size."""
    n = mesh.devices.size
    return ((B + n - 1) // n) * n


def shard_scenarios(tree, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with the scenario axis sharded."""
    sh = scenario_sharding(mesh)
    return jax.tree_util.tree_map(lambda t: jax.device_put(t, sh), tree)


def sharded_mean_var(x: jnp.ndarray, mesh: Mesh, valid: jnp.ndarray):
    """Mean/variance over the (sharded) scenario axis via psum collectives.

    x: [B] statistic per scenario; valid: [B] 0/1 mask (padding scenarios
    excluded).  This is the z-score reduction of reference src/ractip.cpp:
    1648-1669 expressed as an ICI collective.
    """
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SCENARIO_AXES), P(SCENARIO_AXES)), out_specs=P())
    def mv(xs, ms):
        cnt = jax.lax.psum(jnp.sum(ms), SCENARIO_AXES)
        s = jax.lax.psum(jnp.sum(xs * ms), SCENARIO_AXES)
        s2 = jax.lax.psum(jnp.sum(xs * xs * ms), SCENARIO_AXES)
        m = s / cnt
        return m, jnp.maximum(s2 / cnt - m * m, 0.0)

    return mv(x, valid)
