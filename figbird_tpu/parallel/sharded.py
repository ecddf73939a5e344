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
    valid per shard since each shard is itself sorted)."""
    import numpy as np

    m = len(sorted_codes)
    per = -(-m // n_shards)
    pad = per * n_shards - m
    codes = np.concatenate([sorted_codes,
                            np.full(pad, np.iinfo(sorted_codes.dtype).max,
                                    sorted_codes.dtype)])
    pos = np.concatenate([sorted_pos, np.zeros(pad, sorted_pos.dtype)])
    return codes, pos
