"""End-to-end pipeline test: simulated draft -> filled assembly vs truth."""

import numpy as np
import pytest

from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.dtypes import N
from figbird_tpu.pipeline import Pipeline
from figbird_tpu.simulate import SimConfig, simulate


@pytest.fixture(scope="module")
def run():
    sim = simulate(SimConfig(
        genome_len=120_000, n_contigs=1, n_gaps=8, gap_len_range=(8, 60),
        insert_mean=250, insert_sd=20, coverage=25, error_rate=0.004, seed=42))
    cfg = FigbirdConfig(
        draft_genome="", output_folder="",
        read_pairs=[ReadLibrary("", "", avg_insert_size=250,
                                max_read_length=100)],
        parameters=Parameters(trim_len=0, evaluation=0),
    )
    pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)],
                    fill_kwargs={"max_scan_lengths": 48})
    res = pipe.run(max_iterations=2)
    return sim, res


def test_ns_reduced(run):
    sim, res = run
    n0 = sim.draft.count_n()
    n1 = res.genome.count_n()
    assert n1 < n0 * 0.35, f"insufficient fill: {n0} -> {n1}"


def test_filled_matches_truth(run):
    sim, res = run
    # compare filled bases to truth at original gap locations, tracking the
    # cumulative length offset introduced by resized gaps
    gaps = sim.draft.find_gaps()
    total = correct = 0
    filled_total = 0
    for (gaps_i, strings, skips) in res.gap_history[:1]:
        for g, s in zip(gaps_i, strings):
            tr = sim.truth.contigs[g.contig][g.start : g.start + g.length]
            if len(s) == g.length:
                m = s != N
                total += g.length
                filled_total += int(m.sum())
                correct += int((s[m] == tr[m]).sum())
    assert total > 0
    acc = correct / max(filled_total, 1)
    assert acc > 0.95, f"filled-base accuracy {acc:.3f}"
    assert filled_total / total > 0.5


def test_iteration_stats(run):
    sim, res = run
    st = res.iterations[0]
    assert st.n_model > 500
    assert st.gaps == 8
    assert st.n_after <= st.n_before
