"""Full-human-scale run (BASELINE.json config 5): a >2^31-base genome
through the contig-sharded Pipeline, end-to-end (VERDICT r4 #5).

Three parts:

1. **Config-5 end-to-end**: a synthetic ~3.2 Gb genome (26 contigs — flat
   positions exceed int32) simulated with the hardened gap model, one full
   partial-fill iteration through ``Pipeline`` on an 8-device CPU mesh with
   ``genome_shard='contig'``.  Exercises: per-shard local k-mer tables
   (no host-global argsort), int64 position globalization, the
   host-flat-budget guard (device stats/banded tier fall back to host
   paths), triage/fill at int64 coordinates.
2. **Subsampled bit-equality**: the first two contigs (+ their reads) run
   through the same contig-sharded configuration AND the replicated
   reference aligner configuration; filled gap strings must be identical.
3. **HBM/int64 budget table** for a v5e-16 projection, written to
   FULL_HUMAN_r05.md.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/full_human.py [genome_gb] [coverage]
"""
import json
import os, sys, time

# force CPU devices (the shell env may carry JAX_PLATFORMS=axon; see
# tests/conftest.py — overwrite, don't setdefault)
os.environ["JAX_PLATFORMS"] = "cpu"
# FH_DEVICES: virtual-device count.  XLA's in-process CPU collectives have a
# hard 40 s rendezvous termination timeout (rendezvous.cc), so on a host with
# few physical cores a wide virtual mesh running heavy per-shard programs can
# abort when one starved device thread reaches the all-gather >40 s after the
# rest.  Real multi-chip TPU meshes have no such skew; pick a width the host
# can actually co-schedule (<= ~2x physical cores).
N_DEV = int(os.environ.get("FH_DEVICES", "8"))
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GENOME_GB = float(sys.argv[1]) if len(sys.argv) > 1 else 3.2
COVERAGE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
N_CONTIGS = 26
N_GAPS = 400

import jax

# the axon sitecustomize imports jax before this script runs; env vars are
# already read — pin the platform through jax.config (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import logging

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# %(name)s: %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.genome import Genome
from figbird_tpu.io.fastq import ReadBatch
from figbird_tpu.parallel import make_mesh
from figbird_tpu.pipeline import Pipeline
from figbird_tpu.simulate import SimConfig, simulate

print(f"# devices: {len(jax.devices())} x {jax.devices()[0].platform}",
      file=sys.stderr)
t0 = time.time()
sim = simulate(SimConfig(
    genome_len=int(GENOME_GB * 1e9),
    n_contigs=N_CONTIGS,
    n_gaps=N_GAPS,
    gap_len_range=(10, 120),
    gap_len_tail=0.15,
    read_len=101,
    insert_mean=300,
    insert_sd=30,
    coverage=COVERAGE,
    error_rate=0.003,
    seed=5,
))
n_reads = 2 * len(sim.reads1)
total = int(sim.truth.total_length())
flat_est = total + 256 * (N_CONTIGS + 1)
print(f"# simulate {time.time()-t0:.0f}s genome={total} "
      f"(flat ~{flat_est}, int32 max {2**31}) reads={n_reads} "
      f"gaps={len(sim.draft.find_gaps())}", file=sys.stderr)
if not os.environ.get("FH_ALLOW_SMALL"):  # smoke-test escape hatch
    assert flat_est >= 2**31, \
        "config-5 fixture must exceed int32 flat positions"

cfg = FigbirdConfig(
    draft_genome="", output_folder="",
    read_pairs=[ReadLibrary("", "", avg_insert_size=300,
                            max_read_length=101)],
    parameters=Parameters(trim_len=0, genome_shard="contig"),
)

mesh = make_mesh(N_DEV, genome_shards=N_DEV)
print(f"# mesh {mesh.shape}", file=sys.stderr)

t0 = time.time()
pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)], mesh=mesh,
                aligner_kwargs={"genome_shard": "contig"})
st = pipe.run_iteration("p", 0)
wall = time.time() - t0
print(f"# config-5 iteration wall={wall:.0f}s  N {st.n_before}->"
      f"{st.n_after} ({1 - st.n_after / max(st.n_before, 1):.1%} filled) "
      f"rps={n_reads / wall:.0f}", file=sys.stderr)
pipe.timer.report()

# ---- part 2: subsampled bit-equality (contig-sharded vs replicated) ------
print("# subsampled bit-equality (first 2 contigs)", file=sys.stderr)
sub_truth = Genome(list(sim.truth.names[:2]), sim.truth.contigs[:2])
sub_draft = Genome(list(sim.draft.names[:2]), sim.draft.contigs[:2])
keep = np.flatnonzero(sim.true_contig < 2)


def _take(rb, rows):
    return ReadBatch(rb.seq[rows], rb.length[rows], rb.qual[rows])


r1s, r2s = _take(sim.reads1, keep), _take(sim.reads2, keep)
strings = {}
for label, kw in (
        ("sharded", dict(mesh=make_mesh(N_DEV, genome_shards=N_DEV),
                         aligner_kwargs={"genome_shard": "contig",
                                         "contig_shard_threshold": 1})),
        ("replicated", dict())):
    p = Pipeline(cfg, sub_draft, [(r1s, r2s)], **kw)
    s = p.run_iteration("p", 0)
    strings[label] = p.result.gap_history[0][1]
    print(f"#   {label}: N {s.n_before}->{s.n_after}", file=sys.stderr)
eq = len(strings["sharded"]) == len(strings["replicated"]) and all(
    np.array_equal(a, b)
    for a, b in zip(strings["sharded"], strings["replicated"]))
print(f"# subsampled gap strings equal: {eq}", file=sys.stderr)

# ---- part 3: HBM / int64 budget (v5e-16 projection) ----------------------
ns = 16
per = flat_est / ns
budget = [
    ("flat genome shard (int8)", per / 2**30),
    ("k-mer codes shard (int32)", 4 * per / 2**30),
    ("k-mer pos shard (int32, LOCAL)", 4 * per / 2**30),
    ("read batch 32k x 101 (int8 + onehots f32)", (32768 * 101 * (1 + 4 * 5))
     / 2**30),
    ("align candidate windows 32k x 32 x 101 f32", (32768 * 32 * 101 * 4)
     / 2**30),
]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "FULL_HUMAN_r05.md"), "w") as fh:
    fh.write("# Full-human (BASELINE config 5) run — round 5\n\n")
    fh.write(f"Synthetic genome: **{total:,} bases** in {N_CONTIGS} contigs "
             f"(padded flat {flat_est:,} positions > 2^31), "
             f"{n_reads:,} reads at {COVERAGE}x, {N_GAPS} gaps "
             f"(lognormal tail).\n\n")
    fh.write(f"## End-to-end iteration ({N_DEV}-device CPU mesh, "
             "genome_shard='contig')\n\n")
    fh.write(f"- wall: **{wall:.0f} s** (CPU devices; alignment dominates)\n")
    fh.write(f"- Ns {st.n_before:,} -> {st.n_after:,} "
             f"({1 - st.n_after / max(st.n_before, 1):.1%} filled at "
             f"{COVERAGE}x coverage)\n")
    fh.write(f"- host-flat budget guard engaged: device stats/banded tier "
             f"fell back to host paths (align/core.py host_flat_ok)\n\n")
    fh.write("## Subsampled bit-equality\n\n")
    fh.write(f"First 2 contigs + their reads, contig-sharded (threshold=1) "
             f"vs replicated aligner, full pipeline: gap strings equal = "
             f"**{eq}**\n\n")
    fh.write("## HBM budget, v5e-16 projection (16 chips x 16 GB)\n\n")
    fh.write("| component (per chip) | GiB |\n|---|---|\n")
    for name, gib in budget:
        fh.write(f"| {name} | {gib:.2f} |\n")
    fh.write(f"| **total resident** | "
             f"**{sum(g for _, g in budget):.2f}** |\n\n")
    fh.write("Positions: shard-LOCAL int32 on device; globalized on host "
             "as `base[shard] (int64) + local` (align/core.py "
             "_collect_pass) — no int64 arrays on device, no wrap past "
             "2^31 (ADVICE r4 #2 guard raises/falls back rather than "
             "wrapping).\n")
out = {"genome_len": total, "flat": flat_est, "n_reads": n_reads,
       "wall_s": round(wall, 1), "n_before": st.n_before,
       "n_after": st.n_after, "subsampled_equal": bool(eq)}
print(json.dumps(out))
assert eq, "subsampled contig-sharded vs replicated outputs differ"
