"""Batched pipeline: Pallas-DP path vs jnp-DP path end-to-end equivalence.

RACTIP_TPU_SCAN_PALLAS=1 forces the megakernel posteriors (interpret mode on
CPU); the decoded structures and objectives must match the jnp path."""

import os

import numpy as np
import pytest

from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.batched import predict_batch
from ractip_tpu.pipeline.ractip import Options


@pytest.mark.parametrize("duplex", [False, True])
def test_predict_batch_pallas_equivalence(duplex):
    rng = np.random.default_rng(0)
    pairs = []
    for _ in range(2):
        n1 = int(rng.integers(16, 25))
        n2 = int(rng.integers(16, 25))
        pairs.append(("".join(rng.choice(list("ACGU"), n1)),
                      "".join(rng.choice(list("ACGU"), n2))))
    opts = Options(use_pf_duplex=duplex)
    params = get_default_params()
    buckets = (32, 32, 32, 64, 64)

    os.environ["RACTIP_TPU_SCAN_PALLAS"] = "0"
    try:
        res0 = predict_batch(params, pairs, opts, iters=400, buckets=buckets)
        os.environ["RACTIP_TPU_SCAN_PALLAS"] = "1"
        res1 = predict_batch(params, pairs, opts, iters=400, buckets=buckets)
    finally:
        del os.environ["RACTIP_TPU_SCAN_PALLAS"]

    assert res0.r1 == res1.r1
    assert res0.r2 == res1.r2
    np.testing.assert_allclose(res0.objective, res1.objective, atol=1e-4)
    assert float(np.max(res1.violation)) < 0.5


def test_predict_batch_mesh_equivalence():
    """The sharded production path (mesh over 8 virtual CPU devices) returns
    the same structures/objectives as the single-device path, including a
    batch that is not a multiple of the mesh size."""
    import jax

    from ractip_tpu.parallel.mesh import scenario_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    rng = np.random.default_rng(3)
    pairs = [("".join(rng.choice(list("ACGU"), 20)),
              "".join(rng.choice(list("ACGU"), 20))) for _ in range(3)]
    opts = Options()
    params = get_default_params()
    buckets = (32, 32, 32, 64, 64)
    res0 = predict_batch(params, pairs, opts, iters=300, buckets=buckets)
    mesh = scenario_mesh(8)
    res1 = predict_batch(params, pairs, opts, iters=300, buckets=buckets,
                         mesh=mesh)
    assert res0.r1 == res1.r1 and res0.r2 == res1.r2
    np.testing.assert_allclose(res0.objective, res1.objective, atol=1e-5)
