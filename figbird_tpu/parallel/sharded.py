"""Sharded execution of the three device stages.

* ``sharded_align`` — 2-D (reads x genome) shard_map: every device aligns its
  read shard against its k-mer table shard, then the per-shard bests combine
  across the ``genome`` axis with an all-gather + local argmax (the winning
  shard's candidate wins; scores are comparable across shards because the
  scoring model is shared).  Collectives ride ICI.
* ``sharded_fill`` — gap/length instances shard along ``reads`` (pure data
  parallel; no cross-instance communication).
* ``psum_stats`` — model sufficient statistics all-reduce (replaces every
  reference worker redundantly re-learning the model, Figbird.cpp:7118-7132).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level; experimental is deprecated
    from jax import shard_map as _shard_map_raw
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_raw


def shard_map(f, mesh, in_specs, out_specs):
    try:  # older API needed check_rep=False for untraced replication rules
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)
    except TypeError:  # jax >= 0.8: check_rep removed
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from ..align.core import AlignParams, _align_one_strand, _revcomp_batch, as_rows
from ..fill.em import FillConfig, em_partial_instance, em_unmapped_instance


def sharded_align(mesh: Mesh, flat, sorted_codes, sorted_pos, reads, lengths,
                  k: int, params: AlignParams):
    """Align reads over a (reads, genome) mesh.

    ``flat`` is replicated (small relative to the table); ``sorted_codes`` /
    ``sorted_pos`` are sharded along the genome axis (pre-split by code range
    so binary search stays valid per shard); reads shard along the reads axis.
    """

    def local(flat2d_, flatlen_, codes_, pos_, reads_, lengths_):
        # code-range-sharded tables use the searchsorted fallback path
        tables = dict(sorted_codes=codes_, sorted_pos=pos_)
        fwd = _align_one_strand(flat2d_, flatlen_, tables, reads_,
                                lengths_, k, params, None)
        rc = _revcomp_batch(reads_, lengths_)
        rev = _align_one_strand(flat2d_, flatlen_, tables, rc,
                                lengths_, k, params, None)
        use_rev = rev["score"] > fwd["score"]
        best = {kk: jnp.where(use_rev, rev[kk], fwd[kk])
                for kk in ("score", "pos", "start", "end", "n_mis")}
        best["strand"] = use_rev.astype(jnp.int32)
        best["second"] = jnp.maximum(
            jnp.where(use_rev, rev["second"], fwd["second"]),
            jnp.where(use_rev, fwd["score"], rev["score"]))
        # combine across genome shards: gather per-shard bests, pick max score
        stacked = {kk: jax.lax.all_gather(v, "genome") for kk, v in best.items()}
        win = jnp.argmax(stacked["score"], axis=0)
        out = {kk: jnp.take_along_axis(v, win[None, :], axis=0)[0]
               for kk, v in stacked.items()}
        # runner-up across shards for uniqueness
        masked = jnp.where(
            jnp.arange(stacked["score"].shape[0])[:, None] == win[None, :],
            stacked["second"], stacked["score"])
        out["second"] = jnp.max(masked, axis=0)
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("genome"), P("genome"), P("reads", None),
                  P("reads")),
        out_specs={kk: P("reads") for kk in
                   ("score", "pos", "start", "end", "n_mis", "strand", "second")},
    )
    flat = jnp.asarray(flat)
    return fn(jnp.asarray(as_rows(flat)), jnp.int32(flat.shape[0]),
              sorted_codes, sorted_pos, reads, lengths)


def sharded_fill(mesh: Mesh, cfg: FillConfig, insts, model,
                 finalize_flag: bool = True):
    """Gap instances sharded along the reads axis; model replicated."""

    def local(insts_, model_):
        if cfg.partial_mode:
            fn = lambda i: em_partial_instance(cfg, i, model_)
        else:
            fn = lambda i: em_unmapped_instance(cfg, i, model_, finalize_flag)
        return jax.vmap(fn)(insts_)

    sample = local  # specs: every inst array sharded on axis 0
    in_specs = ({kk: P("reads") for kk in insts}, {kk: P() for kk in model})
    # probe output structure once (cheap: eval_shape)
    out_shape = jax.eval_shape(local, insts, model)
    out_specs = jax.tree.map(lambda _: P("reads"), out_shape)
    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return fn(insts, model)


def psum_stats(mesh: Mesh, per_shard_hist):
    """All-reduce model sufficient statistics across both mesh axes."""

    def local(h):
        return jax.lax.psum(jax.lax.psum(h, "reads"), "genome")

    fn = shard_map(local, mesh=mesh, in_specs=P("reads"),
                   out_specs=P())
    return fn(per_shard_hist)


def split_index_by_code(sorted_codes, sorted_pos, n_shards: int):
    """Split a sorted k-mer table into equal-size shards (binary search stays
    valid per shard since each shard is itself sorted).

    Split points snap to CODE boundaries (all occurrences of a k-mer live in
    one shard), then every shard pads to the common width with sentinel max
    codes — required for hit-set equality with the unsharded table: per-shard
    ``searchsorted`` then enumerates exactly the owner shard's first-H hits.
    """
    import numpy as np

    m = len(sorted_codes)
    per = -(-m // n_shards)
    bounds = [0]
    for s in range(1, n_shards):
        b = min(s * per, m)
        # advance to the next code boundary
        while b < m and b > 0 and sorted_codes[b] == sorted_codes[b - 1]:
            b += 1
        bounds.append(max(b, bounds[-1]))
    bounds.append(m)
    width = max(bounds[i + 1] - bounds[i] for i in range(n_shards))
    width = max(width, 1)
    sent = np.iinfo(sorted_codes.dtype).max
    codes = np.full(n_shards * width, sent, sorted_codes.dtype)
    pos = np.zeros(n_shards * width, sorted_pos.dtype)
    for i in range(n_shards):
        lo, hi = bounds[i], bounds[i + 1]
        codes[i * width : i * width + hi - lo] = sorted_codes[lo:hi]
        pos[i * width : i * width + hi - lo] = sorted_pos[lo:hi]
    return codes, pos


def make_genome_sharded_align(mesh: Mesh, k: int, params):
    """Production genome-axis-sharded aligner program.

    Each device runs the FULL per-read alignment (align_batch_device body)
    against its code-range shard of the k-mer table, then the per-shard bests
    combine across the ``genome`` axis: winner by score, runner-up across
    shards for uniqueness, overflow OR-ed.  With code-boundary-aligned shards
    (split_index_by_code) the hit enumeration per k-mer is identical to the
    unsharded searchsorted table, so results are bit-equal to a replicated
    aligner (tests/test_parallel.py).
    """
    from ..align.core import align_batch_device

    inner = align_batch_device.__wrapped__

    def local(flat2d, flatlen, codes, pos, reads, lengths):
        tables = dict(sorted_codes=codes, sorted_pos=pos)
        out = inner(flat2d, flatlen, tables, reads, lengths, k, params, None)
        st = {kk: jax.lax.all_gather(v, "genome") for kk, v in out.items()}
        # winner with the replicated aligner's exact tie-break order:
        # max score, then forward strand, then lowest candidate slot
        # (candidate slots are globally indexed; each slot's hit lives in
        # exactly one shard, so the triple is unique)
        BIG = jnp.int32(1 << 30)
        mx = jnp.max(st["score"], axis=0)
        elig = st["score"] == mx
        mnst = jnp.min(jnp.where(elig, st["strand"].astype(jnp.int32), 2),
                       axis=0)
        elig = elig & (st["strand"].astype(jnp.int32) == mnst[None, :])
        mnci = jnp.min(jnp.where(elig, st["cand_i"], BIG), axis=0)
        win = jnp.argmax(elig & (st["cand_i"] == mnci[None, :]), axis=0)

        def take(v):
            idx = win.reshape((1,) + win.shape + (1,) * (v.ndim - 2))
            return jnp.take_along_axis(
                v, jnp.broadcast_to(idx, (1,) + v.shape[1:]), axis=0)[0]

        res = {kk: take(v) for kk, v in st.items()}
        # runner-up at a DISTINCT GENOME POSITION from the winner (the
        # replicated uniqueness rule): a shard whose best sits at the winning
        # position contributes its own runner-up instead
        masked = jnp.where(st["pos"] == res["pos"][None, :],
                           st["second"], st["score"])
        res["second"] = jnp.max(masked, axis=0)
        res["hit_overflow"] = jnp.any(st["hit_overflow"], axis=0)
        res["unique"] = res["aligned"] & (res["score"] > res["second"])
        from ..align.core import _pack_out

        res["packed"] = _pack_out(res, reads.shape[1])
        # post-all-gather values are genome-replicated, but shard_map cannot
        # infer that statically — make it provable with an explicit psum of
        # the rank-0 copy
        gi = jax.lax.axis_index("genome")
        res = {kk: jax.lax.psum(
            jnp.where(gi == 0, v, jnp.zeros_like(v)), "genome")
            if v.dtype != jnp.bool_ else
            jax.lax.psum(jnp.where(gi == 0, v.astype(jnp.int32),
                                   0), "genome").astype(jnp.bool_)
            for kk, v in res.items()}
        return res

    # out spec: every output sharded along reads
    def fn(flat2d, flatlen, codes, pos, reads, lengths):
        probe = jax.eval_shape(
            lambda r, l: inner(flat2d, flatlen,
                               dict(sorted_codes=codes, sorted_pos=pos),
                               r, l, k, params, None), reads, lengths)
        keys = set(probe) | {"second", "hit_overflow", "unique", "packed"}
        out_specs = {kk: P("reads") for kk in keys}
        m = shard_map(local, mesh=mesh,
                      in_specs=(P(), P(), P("genome"), P("genome"),
                                P("reads", None), P("reads")),
                      out_specs=out_specs)
        return m(flat2d, flatlen, codes, pos, reads, lengths)

    return jax.jit(fn)
