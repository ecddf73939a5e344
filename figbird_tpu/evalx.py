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
