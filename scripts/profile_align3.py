"""Align batch cost on the tunnel TPU (fetch-synced timings)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.align import Aligner, AlignParams, build_index

print("# device:", jax.devices()[0], flush=True)
sim = simulate(SimConfig(genome_len=4_600_000, n_contigs=4, n_gaps=50,
                         gap_len_range=(10, 120), read_len=101,
                         insert_mean=200, insert_sd=20, coverage=10.0,
                         error_rate=0.005, seed=1))
idx = build_index(sim.draft, k=15, device_tables=True)
r = sim.reads1

for bs in (32768, 65536):
    al = Aligner(idx, AlignParams(want_mism=False), batch_size=bs)
    # warm
    al._align_pass(r.seq[:bs], r.length[:bs], al.cheap_params)
    for name, params in (("cheap", al.cheap_params), ("full", al.params)):
        t0 = time.time()
        devs, _ = al._dispatch_pass(r.seq, r.length, params)
        host = jax.device_get(al._fetch_view(devs))
        dt = time.time() - t0
        print(f"# bs={bs} {name}: {dt:.2f}s = {len(r)/dt:.0f} r/s "
              f"({len(devs)} batches)", flush=True)
