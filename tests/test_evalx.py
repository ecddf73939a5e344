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


def test_composite_assembly_hand_derived_tuple():
    """Relocation + inversion + short-flank + gap + junk in ONE assembly,
    with the 6-tuple derived by hand per correct_quast.py:197-241 semantics
    (VERDICT r3 item 6b).

    Reference R: one 60 kb contig.  Assembly:
      A: R[0:10000] + 50 N + R[10050:20000]  -> clean, 1 gap of 50
      B: R[20000:30000] ++ R[35000:45000]    -> relocation (jump 5000 >
         local_max 1000), both flanks 10 kb > reclass_n
         => 1 extensive misassembly
      C: R[45000:50000] ++ rc(R[50000:55000]) -> inversion (strand flip),
         flanks 5 kb > reclass_n => 1 extensive misassembly
      D: R[55000:59500] ++ R[10000:10300]    -> relocation whose SHORTER
         flank (300) <= reclass_n => correct_quast downgrades it: NOT a
         misassembly, flank length feeds erroneous length instead
      E: 500 random bases                    -> unaligned

    Hand tuple: misassemblies=2; erroneous ~= 300 (the reclassified flank,
    measured at anchor resolution); unaligned ~= 500; NGA50 ~= 10 kb
    (the largest segments are 2x10000 + 9950 + 9981, reaching 30 kb =
    ref_total/2 at the 3rd/4th segment); n_gaps=1; total_gap_length=50.
    """
    from figbird_tpu.dtypes import revcomp
    from figbird_tpu.evalx import evaluate_against_reference
    from figbird_tpu.genome import Genome

    rng = np.random.default_rng(99)
    R = rng.integers(0, 4, size=60_000, dtype=np.int8)
    ref = Genome(["ref"], [R])

    A = np.concatenate([R[0:10_000], np.full(50, 4, np.int8),
                        R[10_050:20_000]])
    B = np.concatenate([R[20_000:30_000], R[35_000:45_000]])
    C = np.concatenate([R[45_000:50_000], revcomp(R[50_000:55_000])])
    D = np.concatenate([R[55_000:59_500], R[10_000:10_300]])
    E = rng.integers(0, 4, size=500, dtype=np.int8)
    asm = Genome(["A", "B", "C", "D", "E"], [A, B, C, D, E])

    rep = evaluate_against_reference(asm, ref)
    assert rep.misassemblies == 2, rep
    # reclassified short flank: 300 bases at anchor (stride+k) resolution
    assert 240 <= rep.erroneous_length <= 320, rep
    # junk contig is fully unaligned; real blocks fully covered up to
    # anchor-resolution tails at extensive breakpoints
    assert 500 <= rep.unaligned_length <= 700, rep
    assert 9_900 <= rep.nga50 <= 10_050, rep
    assert rep.n_gaps == 1
    assert rep.total_gap_length == 50
