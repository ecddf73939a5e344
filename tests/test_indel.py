"""Indel-aware alignment tier: banded DP, learned indel stats, native MIM.

Covers the reference capabilities around CIGAR I/D ops: model learning from
indel alignments (processErrorTypes, Figbird.cpp:291-487) and xMyIzM
gap-spanner detection (checkMIM, Preprocess.cpp:885-925).
"""

import numpy as np
import pytest

from figbird_tpu.align import Aligner, AlignParams, build_index, build_pair_table
from figbird_tpu.align.banded import BandedParams, banded_scores_device, host_traceback
from figbird_tpu.align.core import as_rows
from figbird_tpu.dtypes import N
from figbird_tpu.simulate import SimConfig, simulate


def _mkread(genome, rng, start, L=100, ins=None, dele=None, mism=None):
    r = genome[start : start + L + 10].copy()
    if dele:
        c, n = dele
        r = np.concatenate([r[:c], r[c + n :]])
    if ins:
        c, n = ins
        r = np.concatenate([r[:c], rng.integers(0, 4, n, dtype=np.int8), r[c:]])
    r = r[:L]
    if mism is not None:
        for mp in mism:
            r[mp] = (r[mp] + 1) % 4
    return r


def test_banded_device_host_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 4000, dtype=np.int8)
    p = BandedParams()
    L = 100
    cases = [
        (_mkread(genome, rng, 100), 100),
        (_mkread(genome, rng, 300, ins=(40, 2)), 300),
        (_mkread(genome, rng, 600, dele=(55, 3)), 600),
        (_mkread(genome, rng, 900, ins=(30, 1), mism=[70]), 900),
        (_mkread(genome, rng, 1200, dele=(20, 1), mism=[5, 90]), 1200),
    ]
    reads = np.stack([c[0] for c in cases])
    starts = np.array([c[1] for c in cases])
    lens = np.full(len(reads), L, np.int32)
    out = banded_scores_device(jnp.asarray(as_rows(genome)),
                               jnp.asarray(starts), jnp.asarray(reads),
                               jnp.asarray(lens), p)
    sc = np.asarray(out["score"])
    assert sc[0] == 200  # exact read: full match score
    for i, (r, s) in enumerate(cases):
        w = genome[s - p.band : s - p.band + L + 2 * p.band]
        tb = host_traceback(r, w, L, p)
        assert tb["score"] == sc[i], (i, tb["score"], sc[i])
    # ops structure for the clean insertion case
    tb = host_traceback(cases[1][0],
                        genome[300 - p.band : 300 - p.band + L + 2 * p.band],
                        L, p)
    assert [c for c, _ in tb["ops"]] == ["M", "I", "M"]
    assert tb["ins_events"] and tb["ins_events"][0][1] == 2


@pytest.fixture(scope="module")
def indel_sim():
    sim = simulate(SimConfig(
        genome_len=100_000, n_contigs=1, n_gaps=4, coverage=12,
        error_rate=0.003, indel_rate=0.05, read_len=100,
        insert_mean=300, insert_sd=30, seed=5))
    idx = build_index(sim.draft, k=15)
    al = Aligner(idx, AlignParams(), batch_size=2048)
    a1 = al.align(sim.reads1.seq, sim.reads1.length)
    a2 = al.align(sim.reads2.seq, sim.reads2.length)
    return sim, idx, a1, a2


def test_aligner_indel_tier(indel_sim):
    sim, idx, a1, a2 = indel_sim
    n = len(sim.reads1)
    frac = a1["indel"].sum() / n
    assert 0.025 < frac < 0.075, frac  # ~5% simulated
    # winners carry coherent ops
    for row, tb in list(a1["indel_detail"].items())[:10]:
        kinds = {c for c, _ in tb["ops"]}
        assert kinds <= {"M", "I", "D"}
        assert ("I" in kinds) or ("D" in kinds)


def test_model_learns_indel_dists(indel_sim):
    from figbird_tpu.pipeline import _learn_model

    sim, idx, a1, a2 = indel_sim
    pt = build_pair_table(idx, a1, a2, sim.reads1.length, sim.reads2.length,
                          300)
    model, n_model = _learn_model(idx, pt, a1, a2, sim.reads1, sim.reads2,
                                  sim.draft.lengths, True, 100)
    assert n_model > 1000
    # simulated indels are 1-3bp: the learned mass must concentrate there,
    # far above the add-one prior (3/L = 0.03)
    assert model.in_length_dist[:3].sum() > 0.4
    assert model.del_length_dist[:3].sum() > 0.4


def test_native_mim_detection():
    """A full-length read carrying the gap content as an insertion between
    two perfect flank matches must set the bundle's MIM flag natively."""
    from figbird_tpu.triage import Triage
    from figbird_tpu.genome import Genome
    from figbird_tpu.io.fastq import ReadBatch

    rng = np.random.default_rng(7)
    truth = rng.integers(0, 4, 3000, dtype=np.int8)
    # the draft's N-run (2) under-represents the true content (5): a read
    # spanning it aligns xMyIzM — the insertion is the 3-char excess
    # (bowtie2 scores ref Ns as cheap mismatches inside M)
    gap_at, n_run, true_len = 1500, 2, 5
    draft = np.concatenate([truth[:gap_at],
                            np.full(n_run, N, np.int8),
                            truth[gap_at + true_len :]])
    genome = Genome(["c"], [draft])
    gaps = genome.find_gaps()
    assert len(gaps) == 1

    L = 100
    # mate1: MIM read spanning the gap (50 left chars, gap content, right)
    s0 = gap_at - 50
    r1s = truth[s0 : s0 + L].copy()
    # mate2: clean reverse-strand mate at insert 300
    from figbird_tpu.dtypes import COMPLEMENT
    e = s0 + 300
    r2s = COMPLEMENT[truth[e - 1 : e - 1 - L : -1]].copy()
    pad = rng.integers(0, 4, (63, L), dtype=np.int8)  # decoys align nowhere
    seq1 = np.concatenate([r1s[None], pad])
    seq2 = np.concatenate([r2s[None], pad])
    lens = np.full(64, L, np.int32)
    qual = np.full((64, L), ord("I"), np.uint8)
    b1, b2 = ReadBatch(seq1, lens, qual), ReadBatch(seq2, lens.copy(), qual)

    idx = build_index(genome, k=15)
    al = Aligner(idx, AlignParams(), batch_size=64)
    a1 = al.align(b1.seq, b1.length)
    a2 = al.align(b2.seq, b2.length)
    assert a1["indel"][0], "MIM read should win via the banded tier"
    tb = a1["indel_detail"][0]
    assert [c for c, _ in tb["ops"]] == ["M", "I", "M"]

    pt = build_pair_table(idx, a1, a2, b1.length, b2.length, 400)
    tri = Triage(gaps, max_distance=400, read_mean=300, is_jump=False)
    tri.collect_partial(pt, b1, b2, align1=a1, align2=a2)
    b = tri.bundles[0]
    assert b.mim_flag == 1
    assert b.mim_len == (true_len - n_run) + 1  # i_len + 1 (checkMIM)


def test_e2e_fill_with_indels():
    """0.1% read indel rate must not break fill accuracy (VERDICT item 5)."""
    from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
    from figbird_tpu.pipeline import Pipeline

    sim = simulate(SimConfig(
        genome_len=120_000, n_contigs=1, n_gaps=8, gap_len_range=(8, 60),
        insert_mean=250, insert_sd=20, coverage=25, error_rate=0.004,
        indel_rate=0.001, seed=11))
    cfg = FigbirdConfig(
        draft_genome="", output_folder="",
        read_pairs=[ReadLibrary("", "", avg_insert_size=250,
                                max_read_length=100)],
        parameters=Parameters(trim_len=0))
    pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)],
                    fill_kwargs={"max_scan_lengths": 48})
    res = pipe.run(max_iterations=1)
    gaps = sim.draft.find_gaps()
    total = correct = filled = 0
    for (gaps_i, strings, skips) in res.gap_history[:1]:
        for g, s in zip(gaps_i, strings):
            tr = sim.truth.contigs[g.contig][g.start : g.start + g.length]
            if len(s) == g.length:
                m = s != N
                total += g.length
                filled += int(m.sum())
                correct += int((s[m] == tr[m]).sum())
    assert total > 0 and filled / total > 0.5
    acc = correct / max(filled, 1)
    assert acc > 0.95, acc


def test_e2e_banded_recovers_indel_reads():
    """The unmapped pass's end-to-end mode must emit I/D alignments like
    bowtie2's default mode (VERDICT r2 item 8): reads carrying a small indel
    fail the gapless e2e bar but the glocal banded tier recovers them with a
    full-read span."""
    import numpy as np

    from figbird_tpu.align import Aligner, AlignParams, build_index
    from figbird_tpu.align.core import e2e_params
    from figbird_tpu.genome import Genome

    rng = np.random.default_rng(3)
    truth = rng.integers(0, 4, size=40_000, dtype=np.int8)
    g = Genome(["c"], [truth])
    idx = build_index(g, k=15)
    L = 80
    n = 64
    starts = rng.integers(100, 39_000 - L, size=n)
    seq = np.zeros((n, L), np.int8)
    kinds = []
    for i, s in enumerate(starts):
        r = truth[s : s + L + 4].copy()
        kind = i % 3
        kinds.append(kind)
        if kind == 1:  # 2bp deletion at cycle 30
            r = np.concatenate([r[:30], r[32 : L + 2]])
        elif kind == 2:  # 2bp insertion at cycle 30
            ins = rng.integers(0, 4, 2, dtype=np.int8)
            r = np.concatenate([r[:30], ins, r[30 : L - 2]])
        seq[i] = r[:L]
    lens = np.full(n, L, np.int32)

    al = Aligner(idx, e2e_params(AlignParams()), batch_size=512,
                 two_tier=False)
    out = al.align(seq, lens)
    kinds = np.asarray(kinds)
    assert out["aligned"][kinds == 0].all()
    # indel reads must be recovered BY the glocal banded tier, full span
    for k in (1, 2):
        rows = np.flatnonzero(kinds == k)
        assert out["aligned"][rows].mean() > 0.9, f"kind {k}"
        assert out["indel"][rows].mean() > 0.9, f"kind {k}"
        assert (out["clip_start"][rows] == 0).all()
        assert (out["clip_end"][rows] == 0).all()
    # gapless e2e alone must NOT have aligned them (the tier matters)
    al2 = Aligner(idx, e2e_params(AlignParams()), batch_size=512,
                  two_tier=False, indel_tier=False)
    out2 = al2.align(seq, lens)
    assert not out2["aligned"][kinds == 1].any()
    assert not out2["aligned"][kinds == 2].any()
