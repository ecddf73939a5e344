#!/usr/bin/env python
"""Benchmark: reads aligned+assigned per second per chip.

Runs full partial-fill iterations (align -> pair -> model -> triage ->
batched EM fill -> splice) on an E. coli-scale simulated dataset
(BASELINE.json config 1: ~4.6 Mb draft, ~50 gaps, 2x100bp, insert ~200).

Measurement protocol (tunnel-attached TPUs show ~1.5-3x run-to-run
throughput variance, so a single trial is noise):

1. one warm-up iteration (compiles included; wall reported as ``warm_s``,
   with a ``cold_cache`` flag for whether the persistent compile cache was
   empty — scripts/precompile.py populates it ahead of time);
2. ``BENCH_TRIALS`` (default 5) timed iterations on fresh pipelines over the
   SAME inputs; the reported throughput is the MEDIAN, with the relative
   spread (max-min)/median alongside;
3. one reference-exact iteration (uncapped candidate-length scans, uncapped
   overlap-pair sets — the configuration every golden parity test runs) whose
   gap strings are diffed against the capped run: ``outputs_equal`` proves
   the throughput cap does not change the filled assembly, and
   ``exact_rps`` prices the uncapped scan.

Baseline: measured by scripts/measure_baseline.py, which compiles the
reference's Preprocess/FillGaps/Figbird sources (g++ -O2), runs them on an
injected SAM over the SAME simulated dataset, and combines their measured
times with a generous bowtie2 estimate (its archive is a missing blob) and a
granted perfect 8-way fill scaling.  The result lives in
BASELINE_MEASURED.json (``baseline_reads_per_sec``); a documented estimate is
the fallback when that file is absent.

Output: one JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import logging
import os
import statistics
import sys
import time

import numpy as np

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# %(name)s: %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

_FALLBACK_BASELINE_RPS = 50_000.0  # documented estimate, see header


def _baseline_rps_key(key: str):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as fh:
            v = json.load(fh).get(key)
        return float(v) if v else None
    except (OSError, ValueError):
        return None


def _baseline_rps() -> float:
    return _baseline_rps_key("baseline_reads_per_sec") \
        or _FALLBACK_BASELINE_RPS


def _strings_equal(a: list, b: list) -> bool:
    if len(a) != len(b):
        return False
    return all(np.array_equal(x, y) for x, y in zip(a, b))


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    trials = int(os.environ.get("BENCH_TRIALS", "5"))
    run_exact = os.environ.get("BENCH_EXACT", "1") not in ("0", "false", "")
    # Persistent compile cache (the reference's analogue: its g++ binaries
    # persist between runs).  Must be set via jax.config — the axon
    # sitecustomize imports jax before this script's env assignments.
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    cold_cache = not (os.path.isdir(cache_dir) and os.listdir(cache_dir))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
    from figbird_tpu.pipeline import Pipeline
    from figbird_tpu.simulate import SimConfig, simulate

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    sim = simulate(SimConfig(
        genome_len=int(4_600_000 * scale),
        n_contigs=4,
        n_gaps=max(int(50 * scale), 8),
        gap_len_range=(10, 120),
        read_len=101,
        insert_mean=200,
        insert_sd=20,
        coverage=10.0,
        error_rate=0.005,
        seed=1,
    ))
    n_reads = 2 * len(sim.reads1)
    print(f"# genome={sim.truth.total_length()} reads={n_reads} "
          f"gaps={len(sim.draft.find_gaps())}", file=sys.stderr)

    cfg = FigbirdConfig(
        draft_genome="", output_folder="",
        read_pairs=[ReadLibrary("", "", avg_insert_size=200,
                                max_read_length=101)],
        parameters=Parameters(trim_len=0),
    )

    align_bs = int(os.environ.get("BENCH_ALIGN_BATCH", "0"))
    ak = {"batch_size": align_bs} if align_bs else {}

    def one_iteration(mode: str = "p", **kw) -> tuple[float, "Pipeline"]:
        pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)],
                        aligner_kwargs=ak, **kw)
        t0 = time.time()
        st = pipe.run_iteration(mode, 0)
        wall = time.time() - t0
        filled = 1 - st.n_after / max(st.n_before, 1)
        print(f"#   wall={wall:.2f}s  N {st.n_before}->{st.n_after} "
              f"({filled:.1%} filled)", file=sys.stderr)
        return wall, pipe

    # warm-up: compiles every jit cache (persistent-cache hits when warm)
    t0 = time.time()
    one_iteration()
    warm_s = time.time() - t0
    print(f"# warm-up iteration (incl. compile) {warm_s:.1f}s "
          f"(cold_cache={cold_cache})", file=sys.stderr)

    walls = []
    pipe = None
    for t in range(trials):
        print(f"# trial {t + 1}/{trials}", file=sys.stderr)
        wall, pipe = one_iteration()
        walls.append(wall)
    med = statistics.median(walls)
    spread = (max(walls) - min(walls)) / med
    reads_per_sec = n_reads / med
    align_rps = pipe._aligned_reads / max(pipe._align_seconds, 1e-9)
    print(f"# median wall={med:.2f}s over {trials} trials "
          f"(spread {spread:.1%})  align-only={align_rps:.0f} r/s",
          file=sys.stderr)
    pipe.timer.report()

    esc = {k: v for k, v in getattr(pipe, "last_fill_stats", {}).items()
           if k.startswith("esc_")}
    exact_rps = None
    fast_f32_rps = None
    exact_soft_wall = None
    outputs_equal = None
    outputs_equal_precision = None
    if run_exact:
        capped_strings = pipe.result.gap_history[0][1]
        # cap isolation: same lazy precision mode, scan cap OFF
        print("# uncapped-scan trial (cap isolation)", file=sys.stderr)
        wall_e, pipe_e = one_iteration(
            fill_kwargs={"max_scan_lengths": 0})
        exact_rps = round(n_reads / wall_e, 1)
        exact_strings = pipe_e.result.gap_history[0][1]
        outputs_equal = _strings_equal(capped_strings, exact_strings)
        n_diff = sum(1 for x, y in zip(capped_strings, exact_strings)
                     if not np.array_equal(x, y))
        print(f"# capped-vs-uncapped gap strings: "
              f"{len(capped_strings) - n_diff}/{len(capped_strings)} equal",
              file=sys.stderr)
        # precision check: the production default IS the full exact cascade
        # (exact_soft=True); re-running it explicitly both validates
        # determinism (same inputs -> identical strings) and anchors the
        # outputs_equal_precision flag to a measured comparison
        print("# exact-soft trial (precision check)", file=sys.stderr)
        wall_p, pipe_p = one_iteration(fill_kwargs={"exact_soft": True})
        exact_soft_wall = round(wall_p, 2)
        precise_strings = pipe_p.result.gap_history[0][1]
        outputs_equal_precision = _strings_equal(capped_strings,
                                                 precise_strings)
        n_diff_p = sum(1 for x, y in zip(capped_strings, precise_strings)
                       if not np.array_equal(x, y))
        print(f"# default-vs-exact-soft gap strings: "
              f"{len(capped_strings) - n_diff_p}/{len(capped_strings)} equal",
              file=sys.stderr)
        # f32 attribution: what the plain-f32 (r4 fast-path) config costs,
        # and how many strings precision actually changes on this dataset
        print("# plain-f32 trial (precision attribution)", file=sys.stderr)
        wall_f, pipe_f = one_iteration(fill_kwargs={"exact_soft": False})
        fast_f32_rps = round(n_reads / wall_f, 1)
        f32_strings = pipe_f.result.gap_history[0][1]
        n_diff_f = sum(1 for x, y in zip(capped_strings, f32_strings)
                       if not np.array_equal(x, y))
        print(f"# default-vs-f32 gap strings: "
              f"{len(capped_strings) - n_diff_f}/{len(capped_strings)} equal",
              file=sys.stderr)

    # ---- unmapped-pass mode (VERDICT r4 #4): same dataset, u iteration
    # on the draft; parity vs the fully-exact configuration ----
    u_rps = None
    u_vs_baseline = None
    u_outputs_equal = None
    u_esc = {}
    if os.environ.get("BENCH_U", "1") not in ("0", "false", ""):
        print("# u-pass warm-up", file=sys.stderr)
        one_iteration("u")
        u_walls = []
        for t in range(max(trials - 1, 1)):
            print(f"# u-pass trial {t + 1}", file=sys.stderr)
            w, pipe_u = one_iteration("u")
            u_walls.append(w)
        u_med = statistics.median(u_walls)
        u_rps = round(n_reads / u_med, 1)
        u_esc = {k: v for k, v in
                 getattr(pipe_u, "last_fill_stats", {}).items()
                 if k.startswith("esc_")}
        ub = _baseline_rps_key("u_baseline_reads_per_sec")
        if ub:
            u_vs_baseline = round(u_rps / ub, 3)
        if run_exact:
            print("# u-pass reference-exact parity trial", file=sys.stderr)
            _, pipe_ux = one_iteration("u",
                                       fill_kwargs={"reference_exact": True})
            su = pipe_u.result.gap_history[0][1]
            sx = pipe_ux.result.gap_history[0][1]
            u_outputs_equal = _strings_equal(su, sx)
            n_diff_u = sum(1 for x, y in zip(su, sx)
                           if not np.array_equal(x, y))
            print(f"# u default-vs-reference-exact gap strings: "
                  f"{len(su) - n_diff_u}/{len(su)} equal", file=sys.stderr)

    print(json.dumps({
        "metric": "reads_aligned_assigned_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / _baseline_rps(), 3),
        "trials": [round(w, 2) for w in walls],
        "spread": round(spread, 3),
        "warm_s": round(warm_s, 1),
        "cold_cache": cold_cache,
        "capped_rps": round(reads_per_sec, 1),
        "exact_rps": exact_rps,
        "exact_soft_wall_s": exact_soft_wall,
        "fast_f32_rps": fast_f32_rps,
        "prec_escalations": esc,
        "outputs_equal": outputs_equal,
        "outputs_equal_precision": outputs_equal_precision,
        "u_rps": u_rps,
        "u_vs_baseline": u_vs_baseline,
        "u_outputs_equal": u_outputs_equal,
        "u_prec_escalations": u_esc,
    }))


if __name__ == "__main__":
    main()
