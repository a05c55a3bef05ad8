"""Structure I/O (SStruct equivalent): parsers, writers, conversions."""

import pytest

from ractip_tpu.io.sstruct import (Structure, UNKNOWN, UNPAIRED, load_structure,
                                   parse_bpseq, parse_fasta_struct, parse_raw)

import os

from ractip_tpu.evaluate.corpus import data_dir_default

DATA = data_dir_default()


def test_parens_roundtrip():
    s = Structure.from_parens("GGGAAACCC", "(((...)))", "hp")
    assert s.mapping == [8, 7, 6, -1, -1, -1, 2, 1, 0]
    assert s.to_parens() == "(((...)))"
    assert not s.has_pseudoknot()


def test_pseudoknot_pages_and_check():
    # H-type pseudoknot: (( [[ )) ]]
    s = Structure.from_parens("GGAAGGAAGG", "((.[[)).]]", "pk")
    assert s.has_pseudoknot()
    assert s.to_parens() == "((.[[)).]]"


def test_bpseq_roundtrip():
    s0 = Structure.from_parens("GCGAAACGC", "(((...)))", "x")
    s1 = parse_bpseq(s0.to_bpseq(), "x")
    assert s1.seq == s0.seq and s1.mapping == s0.mapping


def test_bpseq_asymmetric_rejected():
    with pytest.raises(ValueError):
        parse_bpseq("1 G 3\n2 A 0\n3 C 0\n")


def test_raw_and_unknown():
    s = parse_raw("GCGC\n")
    assert s.mapping == [UNKNOWN] * 4
    s2 = parse_raw("GCGC\n(..)\n")
    assert s2.mapping == [3, UNPAIRED, UNPAIRED, 0]


def test_fasta_struct_and_autodetect(tmp_path):
    txt = ">a\nGGGAAACCC\n(((...)))\n>b\nACGU\n"
    ss = parse_fasta_struct(txt)
    assert len(ss) == 2
    assert ss[0].mapping[0] == 8
    assert ss[1].mapping == [UNKNOWN] * 4

    p = tmp_path / "a.fa"
    p.write_text(txt)
    assert len(load_structure(p)) == 2

    b = tmp_path / "a.bpseq"
    b.write_text(ss[0].to_bpseq())
    got = load_structure(b)[0]
    assert got.mapping == ss[0].mapping

    r = tmp_path / "a.raw"
    r.write_text("ACGUACGU\n")
    assert load_structure(r)[0].seq == "ACGUACGU"


def test_reference_corpus_files_parse():
    ss = load_structure(os.path.join(DATA, "DIS.fa"))
    assert ss[0].seq.startswith("CUCGGCUUGCUGAGG")
