"""Tests for the core data layer: encodings, FASTA/FASTQ, genome transforms."""

import numpy as np
import pytest

from figbird_tpu.dtypes import A, C, G, GAP_CODE, N, T, decode, encode, revcomp
from figbird_tpu.genome import GapInfo, Genome
from figbird_tpu.io.fasta import fasta_from_strings, read_fasta, write_fasta
from figbird_tpu.io.fastq import ReadBatch, read_fastq, write_fastq
from figbird_tpu.simulate import SimConfig, simulate


def test_encode_decode_roundtrip():
    s = "ACGTNacgtnXR"
    codes = encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4, 4]
    assert decode(codes) == "ACGTNACGTNNN"


def test_revcomp():
    assert decode(revcomp(encode("ACGTN"))) == "NACGT"
    assert decode(revcomp(encode("AACCG"))) == "CGGTT"


def test_fasta_roundtrip(tmp_path):
    f = fasta_from_strings([("c1 extra comment", "ACGT" * 40), ("c2", "TTTNNNACG")])
    # name keeps only the first token
    assert f.names[0] == "c1 extra comment"  # from_strings keeps given name
    p = tmp_path / "x.fa"
    write_fasta(p, f, width=60)
    g = read_fasta(p)
    assert g.names == ["c1", "c2"]
    assert decode(g.seqs[0]) == "ACGT" * 40
    assert decode(g.seqs[1]) == "TTTNNNACG"
    # 60-col wrapping
    lines = p.read_text().splitlines()
    assert lines[1] == ("ACGT" * 40)[:60]


def test_fastq_roundtrip(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r0\nACGT\n+\nIIII\n@r1\nTTGCA\n+\nIIIII\n")
    b = read_fastq(p)
    assert len(b) == 2
    assert b.length.tolist() == [4, 5]
    assert decode(b.seq[0, :4]) == "ACGT"
    assert b.seq[0, 4] == GAP_CODE  # padded with N
    assert decode(b.seq[1, :5]) == "TTGCA"
    out = tmp_path / "y.fq"
    write_fastq(out, b)
    b2 = read_fastq(out)
    assert np.array_equal(b.seq, b2.seq)


def test_readbatch_revcomp():
    b = ReadBatch(
        seq=np.array([[A, C, G, T, GAP_CODE]], dtype=np.int8),
        length=np.array([4], dtype=np.int32),
        qual=np.array([[30, 31, 32, 33, 0]], dtype=np.uint8),
    )
    rc = b.revcomp()
    assert decode(rc.seq[0, :4]) == "ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))
    assert rc.qual[0, :4].tolist() == [33, 32, 31, 30]
    assert rc.seq[0, 4] == GAP_CODE


def test_gap_discovery():
    g = Genome(["c"], [encode("ACGTNNNACGTNACGNN")])
    gaps = g.find_gaps()
    # trailing NN run has no closing non-N char -> dropped (Preprocess.cpp:2115)
    assert [(x.start, x.length) for x in gaps] == [(4, 3), (11, 1)]


def test_gap_discovery_leading_n():
    g = Genome(["c"], [encode("NNACGT")])
    gaps = g.find_gaps()
    assert [(x.start, x.length) for x in gaps] == [(0, 2)]


def test_splice_same_length():
    g = Genome(["c"], [encode("ACGTNNNACGT")])
    gaps = g.find_gaps()
    out = g.splice_gaps(gaps, [encode("TTT")])
    assert decode(out.contigs[0]) == "ACGTTTTACGT"


def test_splice_shorter_longer_empty():
    g = Genome(["c"], [encode("ACGTNNNACGTNNAC")])
    gaps = g.find_gaps()
    out = g.splice_gaps(gaps, [encode("GGGGG"), encode("")])
    assert decode(out.contigs[0]) == "ACGTGGGGGACGTAC"


def test_splice_negative_gap_skip():
    # negative gap: fill empty AND skip 2 chars after the gap (overlap merge)
    g = Genome(["c"], [encode("AAACCNNNGGTTT")])
    gaps = g.find_gaps()
    out = g.splice_gaps(gaps, [encode("")], skip_after=[2])
    assert decode(out.contigs[0]) == "AAACCTTT"


def test_flank_trim():
    # gap of 3 Ns with clean flanks, read_len 10, trim 2
    g = Genome(["c"], [encode("AAAAACCNNNGGTTTTT")])
    t = g.flank_trim(trim_len=2, read_len=10)
    assert decode(t.contigs[0]) == "AAAAANNNNNNNTTTTT"
    # gap length 1 (<2 Ns): untouched
    g2 = Genome(["c"], [encode("AAAAACCNGGTTTTT")])
    t2 = g2.flank_trim(trim_len=2, read_len=10)
    assert decode(t2.contigs[0]) == "AAAAACCNGGTTTTT"
    # gap >= read_len: untouched
    g3 = Genome(["c"], [encode("AAAAACC" + "N" * 12 + "GGTTTTT")])
    t3 = g3.flank_trim(trim_len=2, read_len=10)
    assert decode(t3.contigs[0]) == decode(g3.contigs[0])


def test_reduce_to_gapped():
    g = Genome(["a", "b", "c"], [encode("ACGT"), encode("ACNNT"), encode("GGGG")])
    r, idx = g.reduce_to_gapped()
    assert r.names == ["b"]
    assert idx.tolist() == [1]


def test_flatten():
    g = Genome(["a", "b"], [encode("ACG"), encode("TT")])
    flat, off = g.flatten()
    assert off.tolist() == [0, 3, 5]
    assert decode(flat) == "ACGTT"


def test_simulate_shapes():
    cfg = SimConfig(genome_len=40_000, n_contigs=2, n_gaps=6, coverage=5, seed=1)
    sim = simulate(cfg)
    assert sim.truth.n_contigs == 2
    assert sim.draft.count_n() > 0
    gaps = sim.draft.find_gaps()
    assert len(gaps) == 6
    # mate1 matches truth at true_pos (low error rate -> mostly equal)
    i = 0
    c = sim.truth.contigs[sim.true_contig[i]]
    frag = c[sim.true_pos[i] : sim.true_pos[i] + 100]
    agree = (frag == sim.reads1.seq[i, :100]).mean()
    assert agree > 0.9
    # mate2 is RC of the fragment end
    end = sim.true_pos[i] + sim.true_insert[i]
    frag2 = c[end - 100 : end]
    agree2 = (revcomp(sim.reads2.seq[i, :100]) == frag2).mean()
    assert agree2 > 0.9
