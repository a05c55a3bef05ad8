"""DIS x DIS golden-output knife edge (reference README.md:92-99).

Round-5 finding (RESULTS.md): the long-standing deviation from the golden
brackets is controlled by ONE accessibility tail probability -- our
up([10,22], w=13) = 0.00377 sits 26% above th_ac = 0.003 (a 0.14 kcal/mol
log-space margin), which admits the wide stem-covering region candidate and
makes the duplex-extension solution strictly optimal (obj 13.494 > 12.860).
With the wide region absent (any th_ac above the knife edge), the golden
structure is the certified optimum of OUR exact posteriors.  These tests pin
both sides of the edge.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ractip_tpu.evaluate.corpus import data_dir_default
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.ops.accessibility import accessibility
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.ractip import Options, Posteriors, solve_pair

GOLD1 = "((((.(((((((..[[[[[[.)))))))...))))"
GOLD2 = "((((.(((((((..]]]]]].)))))))...))))"


@pytest.fixture(scope="module")
def setup():
    fa = load_fasta(data_dir_default() + "/DIS.fa")[0]
    params = get_default_params()
    post = Posteriors(params, fa.seq, fa.seq, Options().max_w, True)
    return fa, params, post


def test_knife_edge_up_value(setup):
    """The wide-region window [10,22] sits in the deep tail, just above the
    default th_ac -- the measured control variable of the deviation."""
    fa, params, _ = setup
    n = len(fa.seq)
    S = jnp.asarray(encode(fa.seq, bucket_length(n)))
    pu = np.asarray(accessibility(params, S, jnp.int32(n), 15))
    assert 0.003 < pu[10, 13] < 0.005, pu[10, 13]
    # the golden kissing window is comfortably open
    assert pu[14, 6] > 0.3


def test_golden_above_knife_edge(setup):
    """With th_ac above the knife edge the golden brackets are the certified
    optimum of our exact posteriors, at the audit's golden objective."""
    fa, params, post = setup
    opts = Options(th_ac=0.004)
    r1, r2, obj, _, _ = solve_pair(params, fa, fa, opts, post=post)
    assert (r1, r2) == (GOLD1, GOLD2)
    assert obj == pytest.approx(12.860, abs=5e-3)


def test_extension_below_knife_edge(setup):
    """At the reference default th_ac=0.003 the wide region exists and the
    duplex-extension solution strictly dominates (the near-full extended
    duplex carries the cofold posterior mass; E[#cross pairs] = 27)."""
    fa, params, post = setup
    opts = Options()
    r1, r2, obj, _, _ = solve_pair(params, fa, fa, opts, post=post)
    assert obj == pytest.approx(13.494, abs=5e-3)
    assert obj > 12.87  # strictly dominates the golden structure
    # externals extend beyond the kissing site on both strands
    assert r1.count("[") == 10 and r2.count("]") == 10
