"""Model-learning tests: distributions recover simulation parameters."""

import numpy as np
import pytest

from figbird_tpu.align import Aligner, build_index, build_pair_table
from figbird_tpu.model import (
    ModelStats,
    alignment_error_log10,
    collect_stats,
    compute_gap_prob_cutoff,
    finalize_model,
)
from figbird_tpu.simulate import SimConfig, simulate

INSERT_MEAN = 250.0
INSERT_SD = 25.0
ERR = 0.01


@pytest.fixture(scope="module")
def learned():
    sim = simulate(SimConfig(genome_len=120_000, n_contigs=1, n_gaps=4,
                             insert_mean=INSERT_MEAN, insert_sd=INSERT_SD,
                             coverage=10, error_rate=ERR, seed=5))
    idx = build_index(sim.truth, k=15)
    al = Aligner(idx, batch_size=4096)
    a1 = al.align(sim.reads1.seq, sim.reads1.length)
    a2 = al.align(sim.reads2.seq, sim.reads2.length)
    pt = build_pair_table(idx, a1, a2, sim.reads1.length, sim.reads2.length,
                          max_insert=int(INSERT_MEAN * 2))
    m = pt.model
    # oriented reads: mate as aligned (fwd seq if strand 0 else revcomp)
    from figbird_tpu.align.core import _revcomp_batch
    import jax.numpy as jnp

    def oriented(batch, a):
        rc = np.asarray(_revcomp_batch(jnp.asarray(batch.seq), jnp.asarray(batch.length)))
        return np.where(a["strand"][:, None] == 1, rc, batch.seq)

    o1 = oriented(sim.reads1, a1)
    o2 = oriented(sim.reads2, a2)
    reads = np.concatenate([o1[m], o2[m]])
    lens = np.concatenate([sim.reads1.length[m], sim.reads2.length[m]])
    wins = np.concatenate([a1["pos"][m], a2["pos"][m]]).astype(np.int64)
    strands = np.concatenate([a1["strand"][m], a2["strand"][m]])
    mism = np.concatenate([a1["mism"][m], a2["mism"][m]])
    st = collect_stats(idx.flat, reads, lens, wins, strands, mism,
                       inserts=pt.insert[m], max_read_length=100)
    model = finalize_model(st, sim.truth.lengths)
    # gap prob cutoff from mate2 error probs
    L = 100
    j = np.arange(L)
    win2 = a2["pos"][m].astype(np.int64)
    from2 = idx.flat[win2[:, None] + j[None, :]]
    lg2 = alignment_error_log10(model, o2[m], sim.reads2.length[m], a2["strand"][m],
                                a2["mism"][m], from2)
    model.gap_prob_cutoff = compute_gap_prob_cutoff(model, lg2)
    return sim, idx, model, st


def test_insert_distribution(learned):
    sim, idx, model, st = learned
    assert abs(model.insert_mean - INSERT_MEAN) < 5
    assert abs(model.insert_sd - INSERT_SD) < 6
    assert abs(model.left_sd - INSERT_SD) < 8
    assert abs(model.right_sd - INSERT_SD) < 8
    assert not model.is_conservative


def test_insert_thresholds(learned):
    sim, idx, model, st = learned
    # mean -/+ 3 sigma-ish
    assert model.insert_threshold_min == max(int(model.insert_mean - 3 * model.left_sd), 1)
    assert model.insert_threshold_max == int(model.insert_mean + 3 * model.right_sd)
    assert model.insert_threshold_min < INSERT_MEAN < model.insert_threshold_max


def test_error_rate_recovered(learned):
    sim, idx, model, st = learned
    # mean per-cycle substitution rate ~ simulated error rate (3/4 of errors
    # change the base; simulator always changes) -> expect ~ERR
    mid = model.error_pos_dist[5:95]
    assert abs(mid.mean() - ERR) < ERR * 0.5
    # no-indel model: indel dists stay at smoothed priors
    assert model.in_pos_dist.max() < 0.01


def test_no_error_probs_monotone(learned):
    sim, idx, model, st = learned
    ne = model.no_error_probs
    assert np.all(np.diff(ne) <= 1e-12)
    assert 0.2 < ne[-1] < 1.0  # P(error-free 100bp read) at 1% error ~ 0.36


def test_error_type_probs_rows_normalised(learned):
    sim, idx, model, st = learned
    assert np.allclose(model.error_type_probs.sum(1), 1.0)


def test_gap_prob_cutoff_reasonable(learned):
    sim, idx, model, st = learned
    # 80th pct of -log10 err2: err-free read has -log10 ~ 0.45; each error adds
    # ~ 2-3 decades -> cutoff in [1, 12]
    assert 1 <= model.gap_prob_cutoff <= 12


def test_stats_merge_equals_joint(learned):
    sim, idx, model, st = learned
    # splitting the stats and merging gives identical model (all-reduce safety)
    half = ModelStats(st.max_read_length)
    half2 = ModelStats(st.max_read_length)
    half.insert_counts = st.insert_counts // 2
    half2.insert_counts = st.insert_counts - half.insert_counts
    for name in ("error_pos", "in_pos", "in_lengths", "del_pos", "del_lengths",
                 "error_types", "base_counts", "read_lengths"):
        a = getattr(st, name)
        setattr(half, name, a // 2)
        setattr(half2, name, a - a // 2)
    half.unique_mapped = st.unique_mapped // 2
    half2.unique_mapped = st.unique_mapped - half.unique_mapped
    merged = half.merge(half2)
    m2 = finalize_model(merged, sim.truth.lengths)
    assert np.allclose(m2.insert_dist, model.insert_dist)
    assert np.allclose(m2.error_pos_dist, model.error_pos_dist)
    assert m2.insert_threshold_min == model.insert_threshold_min


def test_effective_length(learned):
    sim, idx, model, st = learned
    tot = int(sim.truth.lengths.sum())
    assert model.effective_length(-1) == tot
    assert model.effective_length(100) == tot - 100 + 1  # single contig


def test_device_stats_match_host():
    """Device model learning (model/device_stats.py) must reproduce the host
    collect_stats path bit-for-bit on the count statistics and agree on the
    derived model (pipeline._learn_model device vs host branches)."""
    from figbird_tpu.pipeline import _learn_model_device, _learn_model_host

    sim = simulate(SimConfig(genome_len=80_000, n_contigs=1, n_gaps=3,
                             insert_mean=INSERT_MEAN, insert_sd=INSERT_SD,
                             coverage=8, error_rate=ERR, seed=11))
    idx = build_index(sim.truth, k=15)
    al = Aligner(idx, batch_size=2048)
    r1, r2 = sim.reads1, sim.reads2
    a1 = al.align(r1.seq, r1.length, keep_stats=True)
    a2 = al.align(r2.seq, r2.length, keep_stats=True)
    pt = build_pair_table(idx, a1, a2, r1.length, r2.length,
                         max_insert=int(INSERT_MEAN * 2))
    md, nd = _learn_model_device(idx, pt, a1, a2, r1, r2, sim.truth.lengths,
                                 partial_flag=True, partial_len=100,
                                 aligner=al)
    mh, nh = _learn_model_host(idx, pt, a1, a2, r1, r2, sim.truth.lengths,
                               partial_flag=True, partial_len=100)
    assert nd == nh
    np.testing.assert_array_equal(md.insert_dist, mh.insert_dist)
    np.testing.assert_allclose(md.error_pos_dist, mh.error_pos_dist, rtol=1e-6)
    np.testing.assert_array_equal(md.error_type_probs, mh.error_type_probs)
    np.testing.assert_allclose(md.base_error_rates, mh.base_error_rates,
                               rtol=1e-9)
    assert md.insert_threshold_min == mh.insert_threshold_min
    assert md.insert_threshold_max == mh.insert_threshold_max
    assert md.gap_prob_cutoff == mh.gap_prob_cutoff
