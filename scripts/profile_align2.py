"""Fine-grained align-stage profile: host prep / H2D / dispatch / D2H split."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.align import Aligner, AlignParams, build_index

print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
sim = simulate(SimConfig(genome_len=4_600_000, n_contigs=4, n_gaps=50,
                         gap_len_range=(10, 120), read_len=101,
                         insert_mean=200, insert_sd=20, coverage=10.0,
                         error_rate=0.005, seed=1))
idx = build_index(sim.draft, k=15)
r1 = sim.reads1
n = len(r1)
print(f"# reads/mate: {n}", flush=True)

import figbird_tpu.align.core as core

al = Aligner(idx, AlignParams())
# warm all programs once
_ = al.align(r1.seq[:al.batch_size], r1.length[:al.batch_size])
print("# warm done", flush=True)

# measure one clean full align
for trial in range(2):
    t0 = time.time()
    out = al.align(r1.seq, r1.length)
    print(f"# align[{trial}] {time.time()-t0:.2f}s = {n/(time.time()-t0):.0f} r/s", flush=True)

# phase split: cheap pass only
t0 = time.time()
o = al._align_pass(r1.seq, r1.length, al.cheap_params)
t_cheap = time.time() - t0
slack = 3 * (al.params.match - al.params.mismatch)
confident = (o["aligned"] & o["unique"] & ~o["hit_overflow"]
             & (o["clip_start"] == 0) & (o["clip_end"] == 0)
             & (o["score"] >= al.params.match * r1.length.astype(np.int64) - slack))
rows = np.flatnonzero(~confident)
t0 = time.time()
full = al._align_pass(r1.seq[rows], r1.length[rows], al.params)
t_full = time.time() - t0
t0 = time.time()
al._banded_escalate(r1.seq, r1.length, o)
t_band = time.time() - t0
print(f"# cheap {t_cheap:.2f}s  full({len(rows)}) {t_full:.2f}s  banded {t_band:.2f}s", flush=True)

# H2D cost alone
t0 = time.time()
ch = [jax.device_put(r1.seq[i:i+al.batch_size]) for i in range(0, n, al.batch_size)]
jax.block_until_ready(ch)
print(f"# H2D all chunks {time.time()-t0:.2f}s ({n*101/1e6:.0f} MB)", flush=True)

# dispatch-only (no D2H): queue all cheap batches, block on last score
t0 = time.time()
outs = []
bs = al.batch_size
for i in range(0, n, bs):
    chunk = r1.seq[i:i+bs]; lens = r1.length[i:i+bs]
    if len(chunk) < bs:
        pad = bs - len(chunk)
        chunk = np.concatenate([chunk, np.full((pad, 101), 4, np.int8)])
        lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
    outs.append(core.align_batch_device(al._flat2d, al._flatlen, al._tables,
                jnp.asarray(chunk), jnp.asarray(lens.astype(np.int32)),
                al.index.k, al.cheap_params, al._prefix_shift))
jax.block_until_ready([o["score"] for o in outs])
t_disp = time.time() - t0
t0 = time.time()
host = jax.device_get(outs)
t_d2h = time.time() - t0
print(f"# dispatch+compute {t_disp:.2f}s  D2H {t_d2h:.2f}s", flush=True)
nb = sum(sum(np.asarray(v).nbytes for v in o.values()) for o in host)
print(f"# D2H bytes {nb/1e6:.1f} MB", flush=True)
