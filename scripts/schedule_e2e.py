"""End-to-end schedule comparison (VERDICT r4 #6) + real-file CLI run (#9).

Two-library (frag insert 200 + jump insert 600) E. coli-scale dataset,
written to FASTA/FASTQ on disk:

1. OUR side: `python -m figbird_tpu Config.json` as a real subprocess —
   the full default two-lib schedule (RunFigbird.sh:534-595 semantics:
   frag-p, jump-u x2, frag-p, jump-u, frag-p x3, Ncount-gated), file IO
   included, on the session's default device (TPU).  Also re-runs the
   first iterations in-memory and checks the CLI's artifacts exist.
2. REFERENCE side: the compiled reference replayed through ITS schedule,
   chaining on its own filled assembly: per iteration our aligner's SAM is
   injected (bowtie2 is a missing blob; its time is credited at the same
   generous 50k reads/s estimate as BASELINE_MEASURED), Preprocess +
   FillGaps are MEASURED, fill granted perfect 8-way thread scaling, g++
   recompiles excluded.

Output: SCHEDULE_E2E_r05.json {ours_wall_s, ref_wall_s, speedup, ...}.

Usage: python scripts/schedule_e2e.py   (TPU for our side; reference on host)
"""
import json
import os, shutil, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BOWTIE2_EST_RPS = 50_000.0
ASSUMED_THREADS = 8
FRAG_INS, JUMP_INS = 200, 600
RL = 101

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import logging

logging.basicConfig(stream=sys.stderr, level=logging.WARNING)

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.io.fasta import read_fasta, write_fasta
from figbird_tpu.io.fastq import write_fastq
from figbird_tpu.genome import Genome

work = "/tmp/schedule_e2e"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)

t0 = time.time()
sim = simulate(SimConfig(
    genome_len=4_600_000, n_contigs=4, n_gaps=50, gap_len_range=(10, 120),
    read_len=RL, insert_mean=FRAG_INS, insert_sd=20, coverage=10.0,
    error_rate=0.005, seed=1))
simj = simulate(SimConfig(
    genome_len=4_600_000, n_contigs=4, n_gaps=50, read_len=RL,
    insert_mean=JUMP_INS, insert_sd=50, coverage=5.0, error_rate=0.005,
    seed=2), truth=sim.truth)
print(f"# sim {time.time()-t0:.0f}s frag={2*len(sim.reads1)} "
      f"jump={2*len(simj.reads1)} reads", file=sys.stderr)

draft_fa = f"{work}/draft.fa"
write_fasta(draft_fa, sim.draft.to_fasta(), width=60)
for tag, rb in (("f1", sim.reads1), ("f2", sim.reads2),
                ("j1", simj.reads1), ("j2", simj.reads2)):
    write_fastq(f"{work}/{tag}.fq", rb)
cfg_json = {
    "Directory": {"Draft_Genome": draft_fa, "Output_Folder": work},
    "Read_Pairs": [
        {"path_1": f"{work}/f1.fq", "path_2": f"{work}/f2.fq",
         "avg_insert_size": FRAG_INS, "max_read_length": RL},
        {"path_1": f"{work}/j1.fq", "path_2": f"{work}/j2.fq",
         "avg_insert_size": JUMP_INS, "max_read_length": RL},
    ],
    "Parameters": {"numthreads": 8, "evaluation": 0, "default": 1,
                   "trim_len": 0},
}
with open(f"{work}/Config.json", "w") as fh:
    json.dump(cfg_json, fh, indent=1)

# ---- 1. our side: the real CLI on real files -----------------------------
print("# running python -m figbird_tpu Config.json ...", file=sys.stderr)
t0 = time.time()
proc = subprocess.run(
    [sys.executable, "-m", "figbird_tpu", f"{work}/Config.json"],
    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    capture_output=True, text=True)
ours_wall = time.time() - t0
sys.stderr.write(proc.stderr[-4000:])
assert proc.returncode == 0, f"CLI failed rc={proc.returncode}"
final_fa = f"{work}/Figbird/FilledScaffolds_final.fa"
assert os.path.exists(final_fa), "CLI did not write the final assembly"
ours = Genome.from_fasta(read_fasta(final_fa))
n_iters = proc.stderr.count("# itr ")
print(f"# ours: {ours_wall:.1f}s end-to-end ({n_iters} iterations), "
      f"final N={ours.count_n()}", file=sys.stderr)

# ---- 2. reference side: replayed schedule with injected SAMs -------------
from figbird_tpu.align import (Aligner, AlignParams, build_index,
                               build_pair_table)
from figbird_tpu.align.core import e2e_params
from figbird_tpu.golden import ReferenceHarness, reference_available
from figbird_tpu.io.sam import write_sam

assert reference_available()
h = ReferenceHarness(f"{work}/ref")
h.build()
MAXD2 = int(JUMP_INS * 1.15)

genome = sim.draft
ref_measured = 0.0   # preprocess + fill (1t) measured
ref_fill_1t = 0.0
ref_pre = 0.0
ref_align_reads = 0
schedule = (["p"] + ["u"] * 2 + ["p"] + ["u"] + ["p"] * 3)
it_done = 0
for it, mode in enumerate(schedule, start=1):
    gaps = genome.find_gaps()
    if not gaps or genome.count_n() == 0:
        break
    cur_fa = f"{work}/ref/genome_{it}.fa"
    write_fasta(cur_fa, genome.to_fasta(), width=60)
    idx = build_index(genome, k=15)
    al = Aligner(idx, AlignParams())
    a1 = al.align(sim.reads1.seq, sim.reads1.length)
    a2 = al.align(sim.reads2.seq, sim.reads2.length)
    pt = build_pair_table(idx, a1, a2, sim.reads1.length, sim.reads2.length,
                         FRAG_INS)
    sam1 = f"{work}/ref/result1_{it}.sam"
    write_sam(sam1, idx, genome.names, sim.reads1, sim.reads2, a1, a2, pt=pt)
    pre = h.run_preprocess(cur_fa, sam1, max_distance=FRAG_INS, samflag=1)
    ref_pre += pre
    ref_align_reads += 2 * len(sim.reads1)
    if mode == "u":
        alj = Aligner(idx, e2e_params(AlignParams()))
        b1 = alj.align(simj.reads1.seq, simj.reads1.length)
        b2 = alj.align(simj.reads2.seq, simj.reads2.length)
        ptj = build_pair_table(idx, b1, b2, simj.reads1.length,
                              simj.reads2.length, MAXD2)
        sam2 = f"{work}/ref/result2_{it}.sam"
        write_sam(sam2, idx, genome.names, simj.reads1, simj.reads2,
                  b1, b2, pt=ptj)
        pre2 = h.run_preprocess(cur_fa, sam2, max_distance=MAXD2, samflag=2)
        ref_pre += pre2
        ref_align_reads += 2 * len(simj.reads1)
        fl = h.run_fillgaps(cur_fa, max_distance=MAXD2, max_read_len=RL,
                            itr=it, partial_flag=0, unmapped=1, threads=1,
                            neg_overlap=30, partial_readlen=RL,
                            insert_mean=JUMP_INS)
    else:
        fl = h.run_fillgaps(cur_fa, max_distance=FRAG_INS, max_read_len=RL,
                            itr=it, partial_flag=1, unmapped=0, threads=1,
                            neg_overlap=30, partial_readlen=RL,
                            insert_mean=FRAG_INS)
    ref_fill_1t += fl
    it_done = it
    filled = h.read_filled_fasta()
    from figbird_tpu.dtypes import encode
    genome = Genome(list(filled.keys()), [encode(v) for v in filled.values()])
    nc = h.read_ncount()
    print(f"# ref itr {it} [{mode}]: pre {pre:.1f}s fill {fl:.1f}s "
          f"N={genome.count_n()} ncount={nc}", file=sys.stderr)
    if nc == 0:
        break

fig_compile = h.figbird_compile_seconds()
ref_fill_work = max(ref_fill_1t - 0.0, 0.0)
ref_wall = (ref_align_reads / BOWTIE2_EST_RPS + ref_pre
            + ref_fill_work / ASSUMED_THREADS)
out = {
    "ours_wall_s": round(ours_wall, 1),
    "ours_iterations": n_iters,
    "ours_final_n": int(ours.count_n()),
    "ref_wall_s": round(ref_wall, 1),
    "ref_iterations": it_done,
    "ref_final_n": int(genome.count_n()),
    "ref_align_est_s": round(ref_align_reads / BOWTIE2_EST_RPS, 1),
    "ref_preprocess_s": round(ref_pre, 1),
    "ref_fill_1t_s": round(ref_fill_1t, 1),
    "ref_fill_8t_granted_s": round(ref_fill_work / ASSUMED_THREADS, 1),
    "figbird_compile_excluded_s": round(fig_compile * it_done, 1),
    "speedup": round(ref_wall / ours_wall, 2),
    "n_reads_total": 2 * len(sim.reads1) + 2 * len(simj.reads1),
}
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "SCHEDULE_E2E_r05.json"), "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
