"""Assembly evaluation.

The reference evaluates with vendored QUAST 2.3 + correct_quast.py
(RunFigbird.sh:794-830), emitting six metrics: misassemblies, erroneous
length, unaligned length, NGA50, #gaps, total gap length
(correct_quast.py:405-409).  QUAST itself is a missing archive in the
reference repo; here we compute the directly-computable subset natively plus
truth-based metrics for simulated data:

* gap statistics (#gaps, total gap length) — correct_quast.py:352-365;
* N50 of the assembly;
* against a known truth genome: filled-base identity at original gap
  positions and the gap-closure set.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .dtypes import N
from .genome import GapInfo, Genome


@dataclass
class AssemblyStats:
    n_contigs: int
    total_length: int
    n50: int
    n_gaps: int
    total_gap_length: int


def assembly_stats(genome: Genome) -> AssemblyStats:
    lens = np.sort(genome.lengths)[::-1]
    total = int(lens.sum())
    c = np.cumsum(lens)
    n50 = int(lens[np.searchsorted(c, total / 2)]) if total else 0
    gaps = genome.find_gaps()
    return AssemblyStats(
        n_contigs=genome.n_contigs,
        total_length=total,
        n50=n50,
        n_gaps=len(gaps),
        total_gap_length=int(sum(g.length for g in gaps)),
    )


@dataclass
class FillAccuracy:
    n_gaps: int
    closed: int            # gaps with no N left (same-length fills)
    filled_bases: int
    correct_bases: int
    total_gap_bases: int

    @property
    def identity(self) -> float:
        return self.correct_bases / max(self.filled_bases, 1)

    @property
    def fill_rate(self) -> float:
        return self.filled_bases / max(self.total_gap_bases, 1)


@dataclass
class EvalReport:
    """The reference's six-metric tuple (correct_quast.py:405-409)."""

    misassemblies: int
    erroneous_length: int
    unaligned_length: int
    nga50: int
    n_gaps: int
    total_gap_length: int

    def as_table(self) -> str:
        return ("Misassemblies\tErroneous_length\tUnaligned_length\tNGA50\t"
                "Num_gaps\tTotal_gap_length\n"
                f"{self.misassemblies}\t{self.erroneous_length}\t"
                f"{self.unaligned_length}\t{self.nga50}\t{self.n_gaps}\t"
                f"{self.total_gap_length}\n")


def _ref_kmer_table(ref: Genome, k: int):
    """Sorted (code, flat_pos) k-mer table over the reference (both strands
    handled by looking up the block's own RC)."""
    flat, offsets = ref.flatten()
    codes_l, pos_l = [], []
    v = flat.astype(np.int64)
    valid = v < 4
    code = np.zeros(len(v) - k + 1, np.int64)
    ok = np.ones(len(v) - k + 1, bool)
    for j in range(k):
        w = v[j : j + len(code)]
        code = code * 4 + np.minimum(w, 3)
        ok &= valid[j : j + len(code)]
    codes_l, pos_l = code[ok], np.flatnonzero(ok)
    order = np.argsort(codes_l, kind="stable")
    return codes_l[order], pos_l[order].astype(np.int64), flat


def _block_diagonals(block: np.ndarray, codes, pos, k: int, stride: int):
    """Anchor k-mers of a block against the table; return (qpos, rpos) hits."""
    if len(block) < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    starts = np.arange(0, len(block) - k + 1, stride)
    v = block.astype(np.int64)
    ok = np.ones(len(starts), bool)
    code = np.zeros(len(starts), np.int64)
    for j in range(k):
        w = v[starts + j]
        code = code * 4 + np.minimum(w, 3)
        ok &= w < 4
    starts, code = starts[ok], code[ok]
    lo = np.searchsorted(codes, code, side="left")
    hi = np.searchsorted(codes, code, side="right")
    cnt = hi - lo
    uniq = cnt == 1  # unique anchors only (repeat-proof)
    return starts[uniq], pos[lo[uniq]]


def evaluate_against_reference(asm: Genome, ref: Genome, k: int = 21,
                               stride: int = 50,
                               local_misassembly_max: int = 1000,
                               min_block: int = 100) -> EvalReport:
    """Reference-based evaluation replacing QUAST 2.3 + correct_quast.py.

    Method: split assembly contigs at N-runs into blocks; anchor each block
    (and its reverse complement) to the reference with unique k-mers; segment
    the anchors into consistent diagonal runs (|diagonal jump| > ``local_
    misassembly_max`` starts a new alignment segment == one extensive
    misassembly breakpoint, mirroring QUAST's extensive-misassembly distance
    and correct_quast.py's --N reclassification of smaller events as local);
    NGA50 from the aligned-segment lengths against the reference size
    (quast --strict-NA semantics: contigs broken at misassemblies).
    """
    from .dtypes import revcomp

    codes, pos, _ = _ref_kmer_table(ref, k)
    ref_total = int(ref.total_length())

    seg_lengths: list[int] = []
    misassemblies = 0
    unaligned = 0
    erroneous = 0

    for contig in asm.contigs:
        isn = contig == N
        # block boundaries at N-runs
        bounds = np.flatnonzero(np.diff(np.concatenate(
            [[True], isn, [True]]).astype(np.int8)))
        for bi in range(0, len(bounds) - 1):
            s, e = int(bounds[bi]), int(bounds[bi + 1])
            if isn[s] if s < len(isn) else True:
                continue
            block = contig[s:e]
            if len(block) < min_block:
                continue
            qf, rf = _block_diagonals(block, codes, pos, k, stride)
            qr, rr = _block_diagonals(revcomp(block), codes, pos, k, stride)
            if len(qf) >= len(qr):
                q, r = qf, rf
            else:
                q, r = qr, rr
            if len(q) == 0:
                unaligned += len(block)
                erroneous += len(block)
                continue
            diag = r - q
            # segment at large diagonal jumps (extensive misassemblies)
            jumps = np.flatnonzero(
                np.abs(np.diff(diag)) > local_misassembly_max)
            seg_start = 0
            n_segs = 0
            for jpt in list(jumps) + [len(q) - 1]:
                q0, q1 = int(q[seg_start]), int(q[jpt]) + k
                if q1 - q0 >= min_block:
                    seg_lengths.append(q1 - q0)
                    n_segs += 1
                seg_start = jpt + 1
            breaks = max(n_segs - 1, 0)
            misassemblies += breaks
            erroneous += breaks * local_misassembly_max  # breakpoint flanks
            # bases outside any anchor span count as unaligned tails
            covered = int(q[-1]) + k - int(q[0])
            unaligned += max(len(block) - covered, 0)

    seg_lengths.sort(reverse=True)
    nga50 = 0
    cum = 0
    for L in seg_lengths:
        cum += L
        if cum >= ref_total / 2:
            nga50 = L
            break

    st = assembly_stats(asm)
    return EvalReport(
        misassemblies=misassemblies,
        erroneous_length=int(erroneous),
        unaligned_length=int(unaligned),
        nga50=int(nga50),
        n_gaps=st.n_gaps,
        total_gap_length=st.total_gap_length,
    )


def fill_accuracy_vs_truth(truth: Genome, gaps: list[GapInfo],
                           strings: list[np.ndarray]) -> FillAccuracy:
    """Per-gap identity of same-length fills against the truth genome."""
    closed = filled = correct = total = 0
    for g, s in zip(gaps, strings):
        tr = truth.contigs[g.contig][g.start : g.start + g.length]
        total += g.length
        if len(s) != g.length:
            continue  # resized gap: identity needs alignment; count as open
        m = s != N
        filled += int(m.sum())
        correct += int((s[m] == tr[m]).sum())
        if m.all():
            closed += 1
    return FillAccuracy(len(gaps), closed, filled, correct, total)
