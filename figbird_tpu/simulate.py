"""Synthetic genome / read-library simulator.

The reference ships no test data (bowtie2 + QUAST archives are missing blobs),
so correctness is established against simulated ground truth: generate a true
genome, punch N-gaps into a draft copy, simulate paired-end Illumina-like
reads from the truth, then check the pipeline restores the gapped bases.

Read geometry matches what the reference expects from bowtie2 (FR orientation:
mate1 forward at fragment start, mate2 reverse-complemented at fragment end;
insert size == outer fragment length).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .dtypes import revcomp
from .genome import Genome
from .io.fastq import ReadBatch


@dataclass
class SimConfig:
    genome_len: int = 200_000
    n_contigs: int = 2
    n_gaps: int = 20
    gap_len_range: tuple[int, int] = (5, 120)
    read_len: int = 100
    insert_mean: float = 300.0
    insert_sd: float = 30.0
    coverage: float = 30.0
    error_rate: float = 0.005
    indel_rate: float = 0.0   # per-read probability of one 1-3bp ins/del
    seed: int = 0
    # mis-assembly artefacts: gaps whose flanks actually OVERLAP in the truth
    # (the draft duplicates ``overlap`` chars around an inserted N-run) — the
    # reference closes these with negative length via find_contig_match
    # (Figbird.cpp:2176-2267) and gaptofill skip counts (FillGaps.cpp:900-909)
    neg_gap_count: int = 0
    neg_gap_len_range: tuple[int, int] = (4, 25)
    neg_overlap_range: tuple[int, int] = (5, 18)
    # realistic gap-length tail (GAGE-like): this fraction of gaps draws
    # from a lognormal tail (median ~150, capped at gap_len_tail_max) —
    # >400 bp gaps hit findFrac's large-gap regime (Figbird.cpp:6879-6906)
    gap_len_tail: float = 0.0
    gap_len_tail_max: int = 2000
    # dispersed repeat families planted in the TRUTH genome (a repeat_len
    # segment copied to repeat_copies random spots) — exercises findRepeat
    # flank skips and ambiguous-alignment handling at scale
    repeat_count: int = 0
    repeat_len: int = 500
    repeat_copies: int = 4


@dataclass
class SimData:
    truth: Genome
    draft: Genome  # truth with gaps replaced by Ns (same lengths — round 1 gaps)
    reads1: ReadBatch
    reads2: ReadBatch
    true_pos: np.ndarray  # (n_pairs,) fragment start (contig-local)
    true_contig: np.ndarray
    true_insert: np.ndarray


def simulate(cfg: SimConfig, truth: Genome | None = None) -> SimData:
    """``truth``: reuse an existing truth genome (e.g. to simulate a second
    read library — frag + jump — over the same ground truth)."""
    rng = np.random.default_rng(cfg.seed)

    # --- truth genome -----------------------------------------------------
    if truth is None:
        lens = np.full(cfg.n_contigs, cfg.genome_len // cfg.n_contigs,
                       dtype=np.int64)
        contigs = [rng.integers(0, 4, size=int(L), dtype=np.int8)
                   for L in lens]
        # plant dispersed repeat families: copy a segment to several spots
        for _ in range(cfg.repeat_count):
            src_c = int(rng.integers(0, cfg.n_contigs))
            if len(contigs[src_c]) < 4 * cfg.repeat_len:
                continue
            s0 = int(rng.integers(0, len(contigs[src_c]) - cfg.repeat_len))
            seg = contigs[src_c][s0 : s0 + cfg.repeat_len].copy()
            for _ in range(cfg.repeat_copies - 1):
                dc = int(rng.integers(0, cfg.n_contigs))
                if len(contigs[dc]) < 4 * cfg.repeat_len:
                    continue
                d0 = int(rng.integers(0, len(contigs[dc]) - cfg.repeat_len))
                contigs[dc][d0 : d0 + cfg.repeat_len] = seg
        truth = Genome([f"scaf{i}" for i in range(cfg.n_contigs)], contigs)
    else:
        contigs = truth.contigs
        cfg = SimConfig(**{**cfg.__dict__, "n_contigs": truth.n_contigs})

    # --- draft with gaps --------------------------------------------------
    # gap specs in TRUTH coordinates: (start, n_len, consumed) — the draft
    # replaces ``consumed`` truth chars with an N-run of ``n_len``; negative
    # ``consumed`` duplicates |consumed| flank chars (a negative gap)
    margin = int(cfg.insert_mean * 2)
    min_sep = 2 * cfg.read_len + 50
    specs: dict[int, list[tuple[int, int, int]]] = {
        i: [] for i in range(cfg.n_contigs)}
    placed = attempts = 0
    want = cfg.n_gaps + cfg.neg_gap_count
    while placed < want and attempts < want * 50:
        attempts += 1
        ci = int(rng.integers(0, cfg.n_contigs))
        neg = placed >= cfg.n_gaps
        if neg:
            glen = int(rng.integers(*cfg.neg_gap_len_range))
            consumed = -int(rng.integers(*cfg.neg_overlap_range))
        else:
            if cfg.gap_len_tail > 0 and rng.random() < cfg.gap_len_tail:
                glen = int(min(rng.lognormal(np.log(150.0), 1.0),
                               cfg.gap_len_tail_max))
                glen = max(glen, cfg.gap_len_range[0])
            else:
                glen = int(rng.integers(cfg.gap_len_range[0],
                                        cfg.gap_len_range[1] + 1))
            consumed = glen
        L = len(contigs[ci])
        if L < 2 * margin + glen:
            continue
        start = int(rng.integers(margin, L - margin - glen))
        if any(abs(start - s) < min_sep + gl + 32
               for s, gl, _ in specs[ci]):
            continue
        specs[ci].append((start, glen, consumed))
        placed += 1
    draft_contigs = []
    for i, c in enumerate(contigs):
        pieces = []
        prev = 0
        for s, glen, consumed in sorted(specs[i]):
            pieces.append(c[prev:s])
            pieces.append(np.full(glen, 4, np.int8))
            prev = s + consumed
        pieces.append(c[prev:])
        draft_contigs.append(np.concatenate(pieces) if pieces else c.copy())
    draft = Genome(list(truth.names), draft_contigs)

    # --- paired reads from the truth -------------------------------------
    n_pairs = int(cfg.coverage * truth.total_length() / (2 * cfg.read_len))
    ci = rng.integers(0, cfg.n_contigs, size=n_pairs)
    inserts = np.maximum(
        rng.normal(cfg.insert_mean, cfg.insert_sd, size=n_pairs).astype(np.int64),
        cfg.read_len + 2,
    )
    starts = np.zeros(n_pairs, dtype=np.int64)
    for k in range(cfg.n_contigs):
        m = ci == k
        hi = len(contigs[k]) - inserts[m] - 1
        starts[m] = (rng.random(m.sum()) * np.maximum(hi, 1)).astype(np.int64)

    L = cfg.read_len
    seq1 = np.zeros((n_pairs, L), dtype=np.int8)
    seq2 = np.zeros((n_pairs, L), dtype=np.int8)
    EXT = 3  # extra template chars so deletion reads stay full-length
    ext1 = np.zeros((n_pairs, L + EXT), dtype=np.int8)
    ext2 = np.zeros((n_pairs, L + EXT), dtype=np.int8)
    for k in range(cfg.n_contigs):
        m = np.flatnonzero(ci == k)
        if m.size == 0:
            continue
        c = contigs[k]
        idx1 = starts[m][:, None] + np.arange(L + EXT)[None, :]
        ext1[m] = c[np.clip(idx1, 0, len(c) - 1)]
        ends = starts[m] + inserts[m]
        idx2 = ends[:, None] - 1 - np.arange(L + EXT)[None, :]  # reversed
        from .dtypes import COMPLEMENT

        ext2[m] = COMPLEMENT[c[np.clip(idx2, 0, len(c) - 1)]]
    seq1[:] = ext1[:, :L]
    seq2[:] = ext2[:, :L]

    # sequencing errors: substitute uniformly at error_rate
    for seq in (seq1, seq2):
        errs = rng.random(seq.shape) < cfg.error_rate
        if errs.any():
            shift = rng.integers(1, 4, size=int(errs.sum()), dtype=np.int8)
            seq[errs] = (seq[errs] + shift) % 4

    # sequencing indels: with indel_rate per read, one 1-3bp event at a
    # random interior cycle — insertion shifts the tail right (random bases
    # in), deletion shifts it left (next truth chars slide in; the tail
    # beyond the template is re-drawn randomly, matching a short template
    # over-read)
    if cfg.indel_rate > 0:
        for seq, ext in ((seq1, ext1), (seq2, ext2)):
            hit = np.flatnonzero(rng.random(n_pairs) < cfg.indel_rate)
            for i in hit:
                n = int(rng.integers(1, EXT + 1))
                c0 = int(rng.integers(10, L - 10 - n))
                if rng.random() < 0.5:  # insertion
                    ins = rng.integers(0, 4, n, dtype=np.int8)
                    seq[i] = np.concatenate([seq[i][:c0], ins,
                                             seq[i][c0 : L - n]])
                else:  # deletion: later template chars slide in; the tail
                    # comes from the extended window so the read stays
                    # full-length against the truth
                    seq[i] = np.concatenate([seq[i][:c0],
                                             ext[i][c0 + n : L + n]])

    lens_arr = np.full(n_pairs, L, dtype=np.int32)
    qual = np.full((n_pairs, L), ord("I"), dtype=np.uint8)
    reads1 = ReadBatch(seq1, lens_arr.copy(), qual.copy())
    reads2 = ReadBatch(seq2, lens_arr.copy(), qual.copy())

    return SimData(truth, draft, reads1, reads2, starts, ci.astype(np.int32), inserts)
