"""chr14-scale benchmark (BASELINE.json config 4): ~88 Mb draft, 5000 gaps.

Simulates a human-chr14-sized draft (8 scaffolds, 2x101bp at 10x coverage)
with a REALISTIC gap-length tail (15% lognormal, >400 bp gaps hitting
findFrac's large-gap regime) and dispersed repeat families (findRepeat /
ambiguous-alignment pressure), runs one full partial-fill iteration cold,
then TWO warm reruns (robustness check — VERDICT r4 #3), and writes a
BENCH_chr14_r{N}.json artifact with vs_baseline against the measured
reference baseline at the same scale (scripts/measure_baseline.py with
BASELINE_PRESET=chr14 -> BASELINE_CHR14.json; same sim seed/params).

Usage: python scripts/chr14_scale.py [n_gaps] [genome_mb]
Env:   CHR14_OUT=BENCH_chr14_r05.json  CHR14_WARM_RUNS=2
"""
import json
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_GAPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
GENOME_MB = float(sys.argv[2]) if len(sys.argv) > 2 else 88.0

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import logging

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# %(name)s: %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.pipeline import Pipeline
from figbird_tpu.simulate import SimConfig, simulate

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
t0 = time.time()
sim = simulate(SimConfig(
    genome_len=int(GENOME_MB * 1e6),
    n_contigs=8,
    n_gaps=N_GAPS,
    gap_len_range=(10, 120),
    gap_len_tail=0.15,
    repeat_count=150,
    read_len=101,
    insert_mean=200,
    insert_sd=20,
    coverage=10.0,
    error_rate=0.005,
    seed=14,
))
n_reads = 2 * len(sim.reads1)
gl = [g.length for g in sim.draft.find_gaps()]
print(f"# simulate {time.time()-t0:.1f}s  genome={sim.truth.total_length()} "
      f"reads={n_reads} gaps={len(gl)} (len p50={int(np.median(gl))} "
      f"max={max(gl)} >400bp={sum(1 for x in gl if x > 400)})",
      file=sys.stderr)

cfg = FigbirdConfig(
    draft_genome="", output_folder="",
    read_pairs=[ReadLibrary("", "", avg_insert_size=200,
                            max_read_length=101)],
    parameters=Parameters(trim_len=0),
)


def one_run(tag):
    pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)])
    t0 = time.time()
    st = pipe.run_iteration("p", 0)
    wall = time.time() - t0
    print(f"# {tag} wall={wall:.1f}s  N {st.n_before}->{st.n_after} "
          f"({1 - st.n_after / max(st.n_before, 1):.1%} filled)  "
          f"rps={n_reads / wall:.0f}", file=sys.stderr)
    pipe.timer.report()
    return wall, st, pipe


wall_cold, st, _ = one_run("cold")
warm_walls = []
n_warm = int(os.environ.get("CHR14_WARM_RUNS", "2"))
pipe_w = None
for i in range(n_warm):
    w, st_w, pipe_w = one_run(f"warm{i + 1}")
    warm_walls.append(w)
    assert st_w.n_after == st.n_after, "reruns disagree on filled Ns"

warm = min(warm_walls) if warm_walls else wall_cold
rps = n_reads / warm

baseline_rps = None
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    with open(os.path.join(repo, "BASELINE_CHR14.json")) as fh:
        baseline_rps = float(json.load(fh)["baseline_reads_per_sec"])
except (OSError, KeyError, ValueError):
    pass

esc = {k: v for k, v in getattr(pipe_w, "last_fill_stats", {}).items()
       if k.startswith("esc_")} if pipe_w else {}
out = {
    "metric": "chr14_reads_aligned_assigned_per_sec_per_chip",
    "value": round(rps, 1),
    "unit": "reads/s",
    "vs_baseline": round(rps / baseline_rps, 3) if baseline_rps else None,
    "baseline_rps": baseline_rps,
    "n_reads": n_reads,
    "n_gaps": len(gl),
    "genome_len": int(sim.truth.total_length()),
    "wall_cold_s": round(wall_cold, 1),
    "wall_warm_s": [round(w, 1) for w in warm_walls],
    "n_before": st.n_before,
    "n_after": st.n_after,
    "prec_escalations": esc,
}
path = os.path.join(repo, os.environ.get("CHR14_OUT", "BENCH_chr14_r05.json"))
with open(path, "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
