"""Evaluation parity tests: known-answer misassembly detection + NGA50
(correct_quast.py semantics — VERDICT r2 item 6)."""

import numpy as np

from figbird_tpu.dtypes import revcomp
from figbird_tpu.evalx import evaluate_against_reference
from figbird_tpu.genome import Genome


def _rand_genome(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=n, dtype=np.int8)


def test_clean_assembly_no_misassemblies():
    t = _rand_genome(40_000, 1)
    ref = Genome(["r"], [t])
    asm = Genome(["a"], [t.copy()])
    rep = evaluate_against_reference(asm, ref)
    assert rep.misassemblies == 0
    assert rep.unaligned_length == 0
    # NGA50 == the single aligned segment ~ contig length
    assert rep.nga50 >= 39_000


def test_relocation_counts_once():
    """A contig joining two far-apart reference regions = 1 misassembly;
    both flanks >> reclass N, so no downgrade."""
    t = _rand_genome(60_000, 2)
    ref = Genome(["r"], [t])
    join = np.concatenate([t[:12_000], t[40_000:52_000]])
    asm = Genome(["a", "b", "c"],
                 [join, t[12_000:40_000].copy(), t[52_000:].copy()])
    rep = evaluate_against_reference(asm, ref)
    assert rep.misassemblies == 1
    # NGA50 from segments broken at the misjoin: 28k, 12k, 12k, 8k
    assert 11_000 <= rep.nga50 <= 12_100


def test_small_flank_reclassified_local():
    """correct_quast --N: a misjoin with a short (<=N) flank is downgraded —
    not a misassembly, its length goes to erroneous length instead."""
    t = _rand_genome(60_000, 3)
    ref = Genome(["r"], [t])
    join = np.concatenate([t[:20_000], t[50_000:52_000]])  # 2 kb flank
    asm = Genome(["a"], [join])
    rep = evaluate_against_reference(asm, ref, reclass_n=4000)
    assert rep.misassemblies == 0
    assert rep.erroneous_length >= 1_900  # ~the reclassified 2 kb segment


def test_inversion_detected():
    t = _rand_genome(60_000, 4)
    ref = Genome(["r"], [t])
    join = np.concatenate([t[:20_000], revcomp(t[20_000:40_000]), t[40_000:]])
    asm = Genome(["a"], [join])
    rep = evaluate_against_reference(asm, ref)
    assert rep.misassemblies == 2  # two strand-flip breakpoints


def test_mismatch_errors_counted():
    t = _rand_genome(30_000, 5)
    ref = Genome(["r"], [t])
    a = t.copy()
    idx = np.arange(500, 25_000, 500)
    a[idx] = (a[idx] + 1) % 4
    asm = Genome(["a"], [a])
    rep = evaluate_against_reference(asm, ref)
    assert rep.misassemblies == 0
    assert rep.erroneous_length >= len(idx) * 0.8
