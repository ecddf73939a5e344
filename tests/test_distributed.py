"""Multi-host logic tested the JAX way (SURVEY §4): two CPU processes under
jax.distributed run one production partial iteration; the filled assembly
must be bit-identical to the single-process run over the same reads.

Exercises all three cross-host merges of parallel/distributed.py: the model
sufficient-statistics all-reduce, the per-gap bundle union, and the
gap-string all-gather.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["FIGBIRD_ROOT"])
import numpy as np
import jax
from figbird_tpu.parallel.distributed import init_from_env
init_from_env()  # must precede any backend-touching jax call
assert jax.process_count() == 2, jax.process_count()

from figbird_tpu.simulate import SimConfig, simulate
from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
from figbird_tpu.pipeline import Pipeline

sim = simulate(SimConfig(genome_len=30_000, n_contigs=2, n_gaps=5,
                         gap_len_range=(6, 30), read_len=48, insert_mean=150,
                         insert_sd=15, coverage=12.0, error_rate=0.004,
                         seed=5))
cfg = FigbirdConfig(
    draft_genome="", output_folder="",
    read_pairs=[ReadLibrary("", "", avg_insert_size=150, max_read_length=48)],
    parameters=Parameters(trim_len=0))
pipe = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)],
                aligner_kwargs={"batch_size": 1024})
st = pipe.run_iteration("p", 0)
out = os.environ["FIGBIRD_OUT"] + f".{jax.process_index()}"
np.savez(out, n_after=st.n_after, n_model=st.n_model,
         **{f"c{i}": c for i, c in enumerate(pipe.genome.contigs)})
print("worker", jax.process_index(), "ok", st.n_before, "->", st.n_after)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_bit_identical(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            FIGBIRD_ROOT=ROOT,
            FIGBIRD_COORD=f"127.0.0.1:{port}",
            FIGBIRD_NPROCS="2",
            FIGBIRD_PROC=str(pid),
            FIGBIRD_OUT=str(tmp_path / "out"),
            JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_cpu",
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
            # the axon sitecustomize initialises the XLA backend at
            # interpreter start, which forbids jax.distributed.initialize —
            # strip it from the import path for workers
            PYTHONPATH=ROOT,
        )
        env.pop("XLA_FLAGS", None)
        # prevent the axon PJRT hook from initialising the backend before
        # jax.distributed.initialize can run
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=800)
        logs.append(out.decode())
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-3000:]

    # single-process reference over the same reads
    from figbird_tpu.simulate import SimConfig, simulate
    from figbird_tpu.config import FigbirdConfig, Parameters, ReadLibrary
    from figbird_tpu.pipeline import Pipeline

    sim = simulate(SimConfig(genome_len=30_000, n_contigs=2, n_gaps=5,
                             gap_len_range=(6, 30), read_len=48,
                             insert_mean=150, insert_sd=15, coverage=12.0,
                             error_rate=0.004, seed=5))
    cfg = FigbirdConfig(
        draft_genome="", output_folder="",
        read_pairs=[ReadLibrary("", "", avg_insert_size=150,
                                max_read_length=48)],
        parameters=Parameters(trim_len=0))
    ref = Pipeline(cfg, sim.draft, [(sim.reads1, sim.reads2)],
                   aligner_kwargs={"batch_size": 1024}, distributed=False)
    st = ref.run_iteration("p", 0)
    assert st.n_after < st.n_before  # gaps actually filled

    for pid in range(2):
        z = np.load(str(tmp_path / f"out.{pid}.npz"))
        assert int(z["n_after"]) == st.n_after, (pid, int(z["n_after"]),
                                                 st.n_after)
        for i, c in enumerate(ref.genome.contigs):
            np.testing.assert_array_equal(z[f"c{i}"], c)
