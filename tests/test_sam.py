"""SAM import/export: roundtrip vs the device aligner + hand-built injection.

The reference's pipeline is SAM-coupled (bowtie2 -> Preprocess.cpp streaming);
these tests pin our interop layer: exported records re-parse to the same
alignment set, and an externally authored SAM drives the post-alignment
stages (the identity-test injection gate, SURVEY §4).
"""

import numpy as np
import pytest

from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.dtypes import decode, encode
from figbird_tpu.genome import Genome
from figbird_tpu.io.fastq import ReadBatch
from figbird_tpu.io.sam import read_sam_pairs, write_sam, _mism_from_md, _parse_cigar
from figbird_tpu.simulate import SimConfig, simulate


def test_cigar_parse():
    cs, ce, alen, _ = _parse_cigar(b"5S90M5S")
    assert (cs, ce, alen) == (5, 5, 90)
    cs, ce, alen, _ = _parse_cigar(b"100M")
    assert (cs, ce, alen) == (0, 0, 100)
    cs, ce, alen, _ = _parse_cigar(b"3S40M2I3D55M")
    assert (cs, ce, alen) == (3, 0, 97)


def test_md_walk_substitutions():
    _, _, _, ops = _parse_cigar(b"2S8M")
    mask, nm = _mism_from_md(b"3A4", ops, 2, 10)
    assert nm == 1
    assert mask[2 + 3] and mask.sum() == 1


def test_md_walk_insertion_shift():
    # 4M 1I 4M: MD covers the 8 M bases; mismatch at aligned base 5 lands at
    # read position 5+1 (the insertion shifts read coords past MD coords)
    _, _, _, ops = _parse_cigar(b"4M1I4M")
    mask, nm = _mism_from_md(b"5G2", ops, 0, 9)
    assert nm == 1
    assert mask[6] and mask.sum() == 1


def test_md_walk_deletion():
    # deletion consumes reference only: ^AC contributes no read position
    _, _, _, ops = _parse_cigar(b"4M2D4M")
    mask, nm = _mism_from_md(b"4^AC2T1", ops, 0, 8)
    assert nm == 1
    assert mask[4 + 2] and mask.sum() == 1


@pytest.fixture(scope="module")
def aligned_sim():
    sim = simulate(SimConfig(genome_len=60_000, n_contigs=2, n_gaps=6,
                             gap_len_range=(10, 40), read_len=70,
                             insert_mean=180, insert_sd=15, coverage=4.0,
                             error_rate=0.004, seed=7))
    idx = build_index(sim.draft, k=15)
    al = Aligner(idx, AlignParams(), batch_size=2048)
    r1, r2 = sim.reads1, sim.reads2
    a1 = al.align(r1.seq, r1.length)
    a2 = al.align(r2.seq, r2.length)
    pt = build_pair_table(idx, a1, a2, r1.length, r2.length, 250)
    return sim, idx, r1, r2, a1, a2, pt


def test_sam_roundtrip(aligned_sim, tmp_path):
    sim, idx, r1, r2, a1, a2, pt = aligned_sim
    path = tmp_path / "out.sam"
    n_written = write_sam(path, idx, sim.draft.names, r1, r2, a1, a2, pt)
    assert n_written == 2 * len(r1)
    br1, br2, b1, b2 = read_sam_pairs(path, idx, sim.draft.names)
    assert len(br1) == len(r1)
    # sequences roundtrip in original read orientation
    np.testing.assert_array_equal(br1.length, r1.length)
    for i in range(0, len(r1), 97):
        L = int(r1.length[i])
        np.testing.assert_array_equal(br1.seq[i, :L], r1.seq[i, :L])
    m = a1["aligned"]
    np.testing.assert_array_equal(b1["aligned"], m)
    np.testing.assert_array_equal(b1["strand"][m], a1["strand"][m])
    np.testing.assert_array_equal(b1["pos"][m], a1["pos"][m])
    np.testing.assert_array_equal(b1["clip_start"][m], a1["clip_start"][m])
    np.testing.assert_array_equal(b1["clip_end"][m], a1["clip_end"][m])
    np.testing.assert_array_equal(b1["unique"][m], a1["unique"][m])
    # mismatch masks agree on the aligned span (MD tag reconstruction);
    # the aligner's mask also marks soft-clipped tails, which MD cannot carry
    L = r1.seq.shape[1]
    j = np.arange(L)[None, :]
    span = (j >= a1["clip_start"][:, None]) & \
           (j <= (r1.length - 1 - a1["clip_end"])[:, None]) & m[:, None]
    np.testing.assert_array_equal(b1["mism"] & span, a1["mism"] & span)


def test_sam_roundtrip_pair_table(aligned_sim, tmp_path):
    sim, idx, r1, r2, a1, a2, pt = aligned_sim
    path = tmp_path / "out.sam"
    write_sam(path, idx, sim.draft.names, r1, r2, a1, a2, pt)
    br1, br2, b1, b2 = read_sam_pairs(path, idx, sim.draft.names)
    pt2 = build_pair_table(idx, b1, b2, br1.length, br2.length, 250)
    np.testing.assert_array_equal(pt2.concordant, pt.concordant)
    np.testing.assert_array_equal(pt2.insert, pt.insert)
    np.testing.assert_array_equal(pt2.model, pt.model)
    np.testing.assert_array_equal(pt2.one_anchored, pt.one_anchored)


def test_sam_model_only_subset(aligned_sim, tmp_path):
    sim, idx, r1, r2, a1, a2, pt = aligned_sim
    path = tmp_path / "myout.sam"
    n = write_sam(path, idx, sim.draft.names, r1, r2, a1, a2, pt,
                  model_only=True)
    assert n == 2 * int(np.asarray(pt.model).sum())
    recs = [l for l in path.read_text().splitlines() if not l.startswith("@")]
    assert len(recs) == n
    assert all("IH:i:1" in l for l in recs)


def test_injected_sam_drives_triage(tmp_path):
    """Hand-authored SAM (external aligner) -> pair table -> partial triage."""
    from figbird_tpu.triage import Triage

    contig = np.concatenate([
        encode("ACGTACGTGGATCCAGTCAAGGTCCATGCA"),
        np.full(8, 4, np.int8),
        encode("TTGACCGGTTAACCGGATATGCGCATTGCA"),
    ])
    genome = Genome(["c0"], [contig])
    idx = build_index(genome, k=15)
    gaps = genome.find_gaps()
    assert len(gaps) == 1 and gaps[0].start == 30

    # read overhanging the left gap edge: first 10 chars match contig[20:30],
    # the rest is clipped (gap content)
    read = np.concatenate([contig[20:30], encode("ACGTACGTAC")])
    seq_str = decode(read)
    sam = "\n".join([
        "@SQ\tSN:c0\tLN:68",
        f"r0\t99\tc0\t21\t42\t10M10S\t=\t40\t30\t{seq_str}\t{'I'*20}"
        "\tAS:i:20\tNM:i:0\tMD:Z:10\tIH:i:1",
        f"r0\t147\tc0\t40\t42\t20M\t=\t21\t-30\t{decode(contig[39:59])}\t"
        f"{'I'*20}\tAS:i:40\tNM:i:0\tMD:Z:20\tIH:i:1",
    ])
    p = tmp_path / "inj.sam"
    p.write_text(sam + "\n")
    r1, r2, a1, a2 = read_sam_pairs(p, idx, genome.names)
    assert bool(a1["aligned"][0]) and bool(a2["aligned"][0])
    assert int(a1["clip_end"][0]) == 10
    pt = build_pair_table(idx, a1, a2, r1.length, r2.length, 250)
    assert bool(pt.concordant[0])
    tri = Triage(gaps, max_distance=250, read_mean=30, is_jump=False)
    o1 = r1.seq  # forward strand: oriented == stored
    o2 = r2.seq
    tri.collect_partial(pt, r1, r2, o1, o2)
    b = tri.bundles[0]
    assert b.n_partial == 1
    # clipped_index = gap_start - pos1 (1-based): 30 - 21 = 9
    assert b.p_clip[0] == 9
    assert b.p_match[0] == 1
