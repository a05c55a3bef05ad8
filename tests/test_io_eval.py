"""FASTA/constraint parsing, F-measure scoring, dinucleotide shuffling."""

import numpy as np
import pytest

from ractip_tpu.evaluate.fmeasure import (PairSets, convert_answer, evaluate,
                                          paren_pairs)
from ractip_tpu.io.fasta import load_pair, parse_fasta
from ractip_tpu.pipeline.shuffle import dinuc_shuffle, klet_counts

import os

from ractip_tpu.evaluate.corpus import data_dir_default

DATA = data_dir_default()


def test_parse_fasta_with_constraints():
    recs = parse_fasta(">a\nACGUACGU\n((..))..\n>b desc\nGGGG\nCCCC\n")
    assert len(recs) == 2
    assert recs[0].name == "a" and recs[0].seq == "ACGUACGU"
    assert recs[0].str_ == "((..)).."
    assert recs[1].seq == "GGGGCCCC" and recs[1].str_ == ""


def test_parse_fasta_reference_corpus():
    fa1, fa2 = load_pair(os.path.join(DATA, "DIS.fa"),
                         os.path.join(DATA, "DIS.fa"))
    assert fa1.seq == "CUCGGCUUGCUGAGGUGCACACAGCAAGAGGCGAG"
    assert fa1.name.startswith("DIS")


def test_constraint_length_mismatch():
    with pytest.raises(ValueError):
        parse_fasta(">a\nACGU\n((..))\n")


def test_fmeasure_golden_identity():
    r1 = "((((.(((((((..[[[[[[.)))))))...))))"
    r2 = "((((.(((((((..]]]]]].)))))))...))))"
    ans = PairSets.from_brackets(r1, r2)
    res = PairSets.from_brackets(r1, r2)
    ev = evaluate(ans, res)
    for key in ("external", "internal", "all"):
        assert ev[key] == (1.0, 1.0, 1.0)


def test_fmeasure_partial():
    ans = PairSets.from_brackets("..[[..", "..]]..")
    res = PairSets.from_brackets("..[...", "...]..")
    ev = evaluate(ans, res)
    sen, ppv, f = ev["external"]
    assert sen == 0.5 and ppv == 1.0 and abs(f - 2 / 3) < 1e-12


def test_paren_pairs_concatenated_external():
    # external pairs are parsed over the concatenation (eval.rb:24)
    pairs = paren_pairs("..[[" + "]]..", "[", "]")
    assert pairs == {(2, 5), (3, 4)}


def test_convert_answer():
    text = "\n".join([
        "name1", "", "((..))....", "5'-ACGUACGUAC-3'", "......[[..", "",
        "name2", "", "..((..))..", "5'-GGGGCCCCAA-3'", "]]........", ""])
    recs = convert_answer(text)
    assert recs[0] == ("name1", "ACGUACGUAC", "((..))[[..")
    assert recs[1] == ("name2", "GGGGCCCCAA", "]]((..))..")


@pytest.mark.parametrize("seq", [
    "ACGUACGUACGGAUCCA", "GGGGAAAACCCC", "AAAAAAAAAC",
    "CUCGGCUUGCUGAGGUGCACACAGCAAGAGGCGAG"])
def test_dinuc_shuffle_preserves_counts(seq):
    rng = np.random.default_rng(42)
    seen = set()
    for _ in range(20):
        t = dinuc_shuffle(seq, rng)
        assert len(t) == len(seq)
        assert t[0] == seq[0] and t[-1] == seq[-1]
        assert klet_counts(t, 2) == klet_counts(seq, 2)
        seen.add(t)
    if seq not in ("GGGGAAAACCCC", "AAAAAAAAAC"):  # unique Euler arrangements
        assert len(seen) > 1    # actually shuffles


def test_dinuc_shuffle_distribution_not_degenerate():
    rng = np.random.default_rng(0)
    seq = "CUCGGCUUGCUGAGGUGCACACAGCAAGAGGCGAG"   # DIS: branching graph
    samples = {dinuc_shuffle(seq, rng) for _ in range(200)}
    assert len(samples) >= 50
