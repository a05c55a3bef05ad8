"""utils: timing, structured records, sweep checkpoint/resume."""

import numpy as np
import pytest

from ractip_tpu.utils import (PairRecord, StageTimer, SweepCheckpoint,
                              read_records, write_records)


def test_stage_timer_accumulates():
    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        t.sync(np.zeros(3))
    rep = t.report()
    assert set(rep) == {"a", "b"} and t.counts["a"] == 2
    assert all(v >= 0 for v in rep.values())
    assert "a" in t.json()


def test_records_roundtrip(tmp_path):
    recs = [
        PairRecord("a", "b", "GG", "CC", "((", "))", objective=1.5,
                   energies={"e1": -3.0}, zscore=(1.0, -2.0),
                   timings={"fold": 0.5}),
        PairRecord("c", "d", "AU", "AU", "..", ".."),
    ]
    p = tmp_path / "out.jsonl"
    write_records(str(p), recs)
    back = read_records(str(p))
    assert back == recs
    write_records(str(p), [recs[0]], append=True)
    assert len(read_records(str(p))) == 3


def test_sweep_checkpoint_resume(tmp_path):
    calls = []

    def run(i):
        calls.append(i)
        return {"x": np.full(3, i), "s": np.asarray([f"r{i}"])}

    st = SweepCheckpoint(str(tmp_path / "ck"), "fp1")
    out = st.map_chunks(3, run)
    assert calls == [0, 1, 2]
    # resume: nothing re-runs, stored results identical
    st2 = SweepCheckpoint(str(tmp_path / "ck"), "fp1")
    out2 = st2.map_chunks(3, run)
    assert calls == [0, 1, 2]
    for a, b in zip(out, out2):
        np.testing.assert_array_equal(a["x"], b["x"])
        assert str(b["s"][0]).startswith("r")
    # partial resume re-runs only missing chunks
    st3 = SweepCheckpoint(str(tmp_path / "ck"), "fp1")
    st3.map_chunks(4, run)
    assert calls == [0, 1, 2, 3]
    # fingerprint mismatch refuses
    with pytest.raises(ValueError):
        SweepCheckpoint(str(tmp_path / "ck"), "other-fp")


def test_predict_batch_checkpoint(tmp_path):
    from ractip_tpu.params.tables import get_default_params
    from ractip_tpu.pipeline.batched import predict_batch
    from ractip_tpu.pipeline.ractip import Options
    pairs = [("GGCAACGGAUGGUUCGUUGCC", "GCACCGAACCAUCCGGUGC"),
             ("GGGAAACCCAA", "UUGGGUUUCCC")]
    opts = Options()
    params = get_default_params()
    ck = str(tmp_path / "sweep")
    r = predict_batch(params, pairs, opts, chunk=1, iters=600, ckpt_dir=ck)
    r2 = predict_batch(params, pairs, opts, chunk=1, iters=600, ckpt_dir=ck)
    assert r.r1 == r2.r1 and r.r2 == r2.r2
    np.testing.assert_allclose(r.objective, r2.objective)
