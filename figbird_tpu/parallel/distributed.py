"""Multi-host (multi-process) execution over DCN.

The reference is strictly single-node: FillGaps.cpp:51-138 spawns
share-nothing worker *processes* joined through files, and every worker
redundantly re-learns the same model from myout.sam (Figbird.cpp:7118-7132).
The TPU-native replacement runs one process per host on a pod slice
(``jax.distributed``), decomposes the READ STREAM across hosts, and merges at
exactly the two collective points SURVEY §5 calls out:

1. **model sufficient statistics** — per-host device sums (see
   model/device_stats.py) are all-reduced across processes, so the model is
   learned once, globally, instead of once per worker;
2. **per-gap read bundles + gap strings** — each host triages its local read
   shard into per-gap bundles; bundles are unioned across hosts in a
   deterministic (process-rank, local-order) order so the reference's
   first-come caps/dedup stay reproducible; each host then fills a disjoint
   strided subset of the gaps and the filled strings are all-gathered, so
   every host splices the identical assembly.

Cross-host transport uses ``jax.experimental.multihost_utils`` collectives
over the jax.distributed backend (ICI within a host, DCN across hosts).
Single-process runs degrade to no-ops, so the pipeline code is identical on
one chip, one host, and N hosts.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax


def init_from_env() -> bool:
    """Initialise jax.distributed from FIGBIRD_* env vars (no-op without).

    FIGBIRD_COORD=host:port  FIGBIRD_NPROCS=N  FIGBIRD_PROC=i
    Returns True when running multi-process.
    """
    coord = os.environ.get("FIGBIRD_COORD")
    if not coord:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["FIGBIRD_NPROCS"]),
        process_id=int(os.environ["FIGBIRD_PROC"]),
    )
    return jax.process_count() > 1


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def shard_reads(n: int, proc: int | None = None, nprocs: int | None = None
                ) -> slice:
    """Contiguous read-pair shard for this process (host-level data split)."""
    p = process_index() if proc is None else proc
    np_ = process_count() if nprocs is None else nprocs
    per = -(-n // np_)
    return slice(p * per, min((p + 1) * per, n))


# ---------------------------------------------------------------- collectives

def _allgather_bytes(buf: bytes) -> list[bytes]:
    """All-gather arbitrary per-process byte strings (padded device gather)."""
    from jax.experimental import multihost_utils as mhu

    n = np.asarray([len(buf)], np.int32)
    lens = np.asarray(mhu.process_allgather(n, tiled=True)).reshape(-1)
    mx = int(lens.max())
    arr = np.zeros(mx, np.uint8)
    arr[: len(buf)] = np.frombuffer(buf, np.uint8)
    gathered = np.asarray(mhu.process_allgather(arr))  # (nprocs, mx)
    return [gathered[i, : lens[i]].tobytes() for i in range(len(lens))]


def allgather_obj(obj) -> list:
    """All-gather small picklable host objects, ordered by process rank."""
    if not is_distributed():
        return [obj]
    return [pickle.loads(b) for b in _allgather_bytes(pickle.dumps(obj))]


def allreduce_stats(st):
    """Merge point #1: sum ModelStats across processes (DCN all-reduce)."""
    if not is_distributed():
        return st
    parts = allgather_obj(st)
    out = parts[0]
    for p in parts[1:]:
        out = out.merge(p)
    return out


def merge_bundles(local_bundles: list) -> list:
    """Merge point #2a: union per-gap read bundles across processes.

    Bundles are re-inserted in (process-rank, local-order) order through the
    same dedup/cap logic, so the result is identical on every host and
    reproduces a single-process run over the full read set whose reads arrive
    grouped by shard.
    """
    if not is_distributed():
        return local_bundles
    from ..triage.assign import GapBundle

    payload = [_bundle_export(b) for b in local_bundles]
    parts = allgather_obj(payload)
    merged = [GapBundle(b.gap) for b in local_bundles]
    for proc_part in parts:
        for mb, data in zip(merged, proc_part):
            _bundle_absorb(mb, data)
    return merged


def _bundle_export(b):
    return dict(u=(b.u_seq, b.u_pos, b.u_rev),
                p=(b.p_seq, b.p_clip, b.p_match, b.p_pos, b.p_refpos,
                   b.p_qual),
                mim=(b.mim_flag, b.mim_len))


def _bundle_absorb(b, data):
    from ..dtypes import PARTIAL_LIMIT, UNMAPPED_LIMIT

    us, up, ur = data["u"]
    for s, p, r in zip(us, up, ur):
        if b.n_unmapped >= UNMAPPED_LIMIT:
            break
        h = s.tobytes()
        if h in b._u_hashes:
            continue
        b._u_hashes.add(h)
        b.u_seq.append(s)
        b.u_pos.append(p)
        b.u_rev.append(r)
    ps, pc, pm, pp, pr, pq = data["p"]
    for s, c, mt, p, r, q in zip(ps, pc, pm, pp, pr, pq):
        if b.n_partial >= PARTIAL_LIMIT:
            break
        h = s.tobytes()
        if h in b._p_hashes:
            continue
        b._p_hashes.add(h)
        b.p_seq.append(s)
        b.p_clip.append(c)
        b.p_match.append(mt)
        b.p_pos.append(p)
        b.p_refpos.append(r)
        b.p_qual.append(q)
    mf, ml = data["mim"]
    if mf and not b.mim_flag:
        b.mim_flag, b.mim_len = mf, ml


def my_gap_subset(n_gaps: int) -> np.ndarray:
    """Strided gap assignment for this process (FillGaps' balancer analogue:
    stride interleaves small/large gaps evenly across hosts)."""
    return np.arange(process_index(), n_gaps, process_count())


def allgather_gap_strings(n_gaps: int, mine: dict) -> list:
    """Merge point #2b: all-gather per-gap filled strings + skip counts.

    ``mine``: {gap_index: (np.int8 string, gaptofill_int)}.
    Returns dense list of (string, skip) for all gaps.
    """
    parts = allgather_obj(mine)
    out = [None] * n_gaps
    for part in parts:
        for gi, v in part.items():
            out[gi] = v
    missing = [i for i, v in enumerate(out) if v is None]
    if missing:
        raise RuntimeError(f"gaps unassigned across hosts: {missing[:5]}")
    return out
