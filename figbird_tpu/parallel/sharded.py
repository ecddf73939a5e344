"""Sharded execution of the three device stages.

* ``make_genome_sharded_align`` / ``make_contig_sharded_align`` — 2-D
  (reads x genome) shard_map aligners: every device aligns its read shard
  against its k-mer table (code-range) or flat-genome (contig-range) shard,
  then per-shard bests combine across ``genome`` with an all-gather +
  tie-break-exact argmax.  Collectives ride ICI.
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

from ..align.core import AlignParams, _revcomp_batch, as_rows
from ..fill.em import FillConfig, em_partial_instance, em_unmapped_instance



def sharded_fill(mesh: Mesh, cfg: FillConfig, insts, model,
                 finalize_flag: bool = True):
    """Gap instances sharded along the reads axis; model replicated."""

    def local(insts_, model_):
        if cfg.partial_mode:
            fn = lambda i: em_partial_instance(cfg, i, model_)
        else:
            fn = lambda i: em_unmapped_instance(cfg, i, model_, finalize_flag)
        return jax.vmap(fn)(insts_)

    # specs: every inst array sharded on axis 0, model replicated
    in_specs = ({kk: P("reads") for kk in insts}, {kk: P() for kk in model})
    # probe output structure once (cheap: eval_shape)
    out_shape = jax.eval_shape(local, insts, model)
    out_specs = jax.tree.map(lambda _: P("reads"), out_shape)
    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return fn(insts, model)


def psum_stats(mesh: Mesh, per_shard_hist):
    """All-reduce model sufficient statistics over the reads axis.

    The input is replicated along ``genome`` (every genome shard sees the
    same read shard's statistics), so only the reads axis sums — a second
    psum over genome would multiply the totals by the shard count."""

    def local(h):
        return jax.lax.psum(h, "reads")

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


def split_index_by_contig(index, n_shards: int):
    """Split a genome into contig-range shards for HBM-limited indexes.

    Each shard holds a SLICE of the padded global flat genome covering a
    contiguous contig range (with the inter-contig pad as leading/trailing
    margin, so windows never span shards) plus its own k-mer table with
    LOCAL int32 positions — the path for genomes beyond one chip's HBM or
    beyond int32 flat positions (BASELINE configs 4-5; SURVEY §5).

    Returns dict(flat2d (ns*rows,128) int8, flatlen (ns,) int32,
    codes (ns*M,) int32, pos (ns*M,) int32, base (ns,) int64) — every
    per-shard block padded to the common width; ``base[s] + local`` is the
    global flat position.
    """
    import numpy as np

    from ..align.core import as_rows
    from ..io.native import native_kmer_table

    ns = n_shards
    flat = index.flat
    offsets = index.offsets
    pad = index.pad
    n_contigs = len(offsets)
    # balance contig ranges by flat length
    ends = np.concatenate([offsets[1:] - pad, [len(flat)]])
    sizes = ends - (offsets - pad)
    target = sizes.sum() / ns
    bounds = [0]
    acc = 0.0
    for ci in range(n_contigs):
        acc += sizes[ci]
        if acc >= target * len(bounds) and len(bounds) < ns:
            bounds.append(ci + 1)
    while len(bounds) < ns:
        bounds.append(n_contigs)
    bounds.append(n_contigs)

    shard_flats, shard_tables, bases = [], [], []
    for s in range(ns):
        lo_c, hi_c = bounds[s], bounds[s + 1]
        if lo_c >= hi_c:  # empty shard: a pad-only stub
            shard_flats.append(np.full(pad, 4, np.int8))
            shard_tables.append((np.zeros(0, np.int32), np.zeros(0, np.int32)))
            bases.append(0)
            continue
        base = int(offsets[lo_c]) - pad
        end = int(ends[hi_c - 1]) + pad
        sl = flat[base : min(end, len(flat))]
        res = native_kmer_table(sl, index.k)
        if res is None:  # pure-python fallback
            from ..align.index import _rolling_codes

            codes, valid = _rolling_codes(np.asarray(sl, np.int8), index.k)
            idx = np.flatnonzero(valid)
            order = np.argsort(codes[idx], kind="stable")
            res = (codes[idx][order].astype(np.int32),
                   idx[order].astype(np.int32))
        shard_flats.append(np.asarray(sl, np.int8))
        shard_tables.append(res)
        bases.append(base)

    rows = max((len(f) + 127) // 128 + 2 for f in shard_flats)
    M = max(max(len(t[0]) for t in shard_tables), 1)
    SENT = np.int32(1 << 30)  # > any k<=15 code
    flat2d = np.full((ns * rows, 128), 4, np.int8)
    flatlen = np.zeros(ns, np.int32)
    codes = np.full(ns * M, SENT, np.int32)
    pos = np.zeros(ns * M, np.int32)
    for s in range(ns):
        f2 = as_rows(shard_flats[s])
        flat2d[s * rows : s * rows + len(f2)] = f2
        flatlen[s] = len(shard_flats[s])
        c, p = shard_tables[s]
        codes[s * M : s * M + len(c)] = c
        pos[s * M : s * M + len(p)] = p
    return dict(flat2d=flat2d, flatlen=flatlen, codes=codes, pos=pos,
                base=np.asarray(bases, np.int64), rows=rows, M=M)


def make_contig_sharded_align(mesh: Mesh, k: int, params):
    """Contig-range genome-sharded aligner (flat genome itself sharded).

    Unlike :func:`make_genome_sharded_align` (code-range table shards over a
    replicated genome), every device holds only ITS contig range of the flat
    genome — the path for indexes larger than one chip's HBM and for
    genomes beyond int32 flat positions.  Bit-equality with the replicated
    aligner requires reproducing its GLOBAL hit enumeration: for each seed
    k-mer, the replicated table enumerates the first H hits in ascending
    global position.  Shards are position-ordered, so the global first-H are
    the per-shard hits whose global rank (cross-shard exclusive prefix of
    per-shard hit counts, one small all_gather) is < H; the candidate slot
    used for tie-breaks is the global rank, and overflow/repeat masks use
    the global count.  Positions stay LOCAL int32 on device (plus the shard
    id); hosts globalize with the int64 shard bases.
    """
    from ..align.core import (GAP_CODE, NEG, _score_candidates, _seed_codes,
                              _use_scan_kernel, _revcomp_batch, _extract_span,
                              _pack_out)

    H = params.hits_per_seed
    S = params.n_seeds

    def one_strand(flat2d, flatlen, codes, pos, reads, lengths):
        B, L = reads.shape
        scodes, valid, offs = _seed_codes(reads, lengths, k, S)
        lo = jnp.searchsorted(codes, scodes, side="left")
        hi = jnp.searchsorted(codes, scodes, side="right")
        cnt = hi - lo                                  # (B,S) local
        cnts = jax.lax.all_gather(cnt, "genome")       # (ns,B,S)
        gi = jax.lax.axis_index("genome")
        ns = cnts.shape[0]
        before = jnp.sum(
            jnp.where(jnp.arange(ns)[:, None, None] < gi, cnts, 0), axis=0)
        total = jnp.sum(cnts, axis=0)
        h = jnp.arange(H)
        hmask = ((h < cnt[..., None]) & (before[..., None] + h < H)
                 & valid[..., None] & (total[..., None] <= params.repeat_limit))
        M = codes.shape[0]
        hit_idx = jnp.clip(lo[..., None] + h, 0, M - 1)
        hit_pos = pos[hit_idx]
        overflow = valid & (total > H) & (total <= params.repeat_limit)
        gslot = (jnp.arange(S)[None, :, None] * H
                 + before[..., None] + h)              # global candidate slot
        cand = hit_pos - offs[:, :, None]
        cand = jnp.clip(cand, 0, flatlen - L - 1)
        C = S * H
        cand = cand.reshape(B, C)
        hmask_f = hmask.reshape(B, C)
        gslot = jnp.clip(gslot, 0, (1 << 20)).reshape(B, C)

        if _use_scan_kernel():
            from ..ops.align_score import score_candidates_scan

            sc = score_candidates_scan(flat2d, reads, cand, params.match,
                                       params.mismatch, GAP_CODE)
            sc["local"] = jnp.where(hmask_f, sc["local"], NEG)
        else:
            sc = _score_candidates(flat2d, reads, cand, hmask_f,
                                   params.match, params.mismatch)
        sel = jnp.where(hmask_f, sc["e2e"], NEG) if params.end_to_end \
            else sc["local"]
        sc["sel"] = sel
        # per-shard best with GLOBAL slot order for ties: minimize
        # (-sel, gslot) — scan slots ascending via argmax of keyed max
        best_sel = jnp.max(sel, axis=-1)
        tie = sel == best_sel[:, None]
        best_slot = jnp.min(jnp.where(tie, gslot, 1 << 20), axis=-1)
        bi = jnp.argmax(tie & (gslot == best_slot[:, None]), axis=-1)

        def take(x):
            return jnp.take_along_axis(x, bi[:, None], axis=1)[:, 0]

        best = dict(score=take(sel), e2e=take(sc["e2e"]),
                    start=take(sc["start"]), end=take(sc["end"]),
                    n_mis=take(sc["n_mis"]), pos=take(cand),
                    cand_i=best_slot.astype(jnp.int32),
                    hit_overflow=jnp.any(overflow, axis=-1))
        others = jnp.where(cand != best["pos"][:, None], sel, NEG)
        best["second"] = jnp.max(others, axis=-1)
        return best

    def local(flat2d, flatlen, codes, pos, reads, lengths):
        B, L = reads.shape
        gi = jax.lax.axis_index("genome")
        flatlen_s = flatlen[0]
        fwd = one_strand(flat2d, flatlen_s, codes, pos, reads, lengths)
        rc_reads = _revcomp_batch(reads, lengths)
        rev = one_strand(flat2d, flatlen_s, codes, pos, rc_reads, lengths)
        use_rev = rev["score"] > fwd["score"]
        out = {kk: jnp.where(use_rev, rev[kk], fwd[kk])
               for kk in ("score", "e2e", "start", "end", "n_mis", "pos",
                          "cand_i")}
        out["hit_overflow"] = fwd["hit_overflow"] | rev["hit_overflow"]
        out["strand"] = use_rev.astype(jnp.int8)
        out["second"] = jnp.maximum(
            jnp.where(use_rev, rev["second"], fwd["second"]),
            jnp.where(use_rev, fwd["score"], rev["score"]))
        out["shard"] = jnp.full((B,), 0, jnp.int32) + gi

        # cross-shard combine: winner by (score desc, strand fwd-first,
        # global slot asc) — the replicated argmax order
        st = {kk: jax.lax.all_gather(v, "genome") for kk, v in out.items()}
        BIG = jnp.int32(1 << 30)
        mx = jnp.max(st["score"], axis=0)
        elig = st["score"] == mx
        mnst = jnp.min(jnp.where(elig, st["strand"].astype(jnp.int32), 2),
                       axis=0)
        elig = elig & (st["strand"].astype(jnp.int32) == mnst[None, :])
        mnci = jnp.min(jnp.where(elig, st["cand_i"], BIG), axis=0)
        win = jnp.argmax(elig & (st["cand_i"] == mnci[None, :]), axis=0)

        def takew(v):
            return jnp.take_along_axis(
                v, win[None, :].astype(jnp.int32), axis=0)[0]

        res = {kk: takew(v) for kk, v in st.items()}
        # runner-up at a distinct (shard, pos) — distinct global position
        same_place = (st["pos"] == res["pos"][None, :]) & \
            (st["shard"] == res["shard"][None, :])
        res["second"] = jnp.max(
            jnp.where(same_place, st["second"], st["score"]), axis=0)

        # winner's genome window, fetched from the owning shard (exactly one
        # owner contributes; the rest add zero, so a psum reconstructs it)
        mine = res["shard"] == gi
        win_chars = _extract_span(
            flat2d, jnp.where(mine, res["pos"], 0), L)
        win_chars = jnp.where(mine[:, None], win_chars.astype(jnp.int32), 0)
        win_chars = jax.lax.psum(win_chars, "genome")
        reads_o = jnp.where(res["strand"][:, None] == 1,
                            _revcomp_batch(reads, lengths), reads)
        rv = reads_o != GAP_CODE
        m = (win_chars == reads_o) & rv & (win_chars != GAP_CODE)
        if params.end_to_end:
            min_score = (params.e2e_min_const + params.e2e_min_per_base
                         * lengths.astype(jnp.float32))
            res["n_mis"] = jnp.sum(rv & ~m, axis=1)
            res["aligned"] = res["score"].astype(jnp.float32) >= min_score
            res["alen"] = lengths
            res["clip_start"] = jnp.zeros_like(lengths)
            res["clip_end"] = jnp.zeros_like(lengths)
        else:
            min_score = (params.min_score_const + params.min_score_log
                         * jnp.log(jnp.maximum(lengths, 2).astype(jnp.float32)))
            res["aligned"] = res["score"].astype(jnp.float32) >= min_score
            res["alen"] = res["end"] - res["start"] + 1
            res["clip_start"] = res["start"]
            res["clip_end"] = jnp.maximum(lengths - 1 - res["end"], 0)
        res["unique"] = res["aligned"] & (res["score"] > res["second"])
        if params.want_mism:
            res["mism_packed"] = jnp.packbits(rv & ~m, axis=1)
        res["packed"] = _pack_out(res, reads.shape[1])
        # broadcast rank-0's combined copy (provably replicated)
        res = {kk: jax.lax.psum(
            jnp.where(gi == 0, v, jnp.zeros_like(v)), "genome")
            if v.dtype != jnp.bool_ else
            jax.lax.psum(jnp.where(gi == 0, v.astype(jnp.int32),
                                   0), "genome").astype(jnp.bool_)
            for kk, v in res.items()}
        return res

    def fn(flat2d, flatlen, codes, pos, reads, lengths):
        keys = ["score", "e2e", "start", "end", "n_mis", "pos", "cand_i",
                "hit_overflow", "strand", "second", "shard", "aligned",
                "alen", "clip_start", "clip_end", "unique", "packed"]
        if params.want_mism:
            keys.append("mism_packed")
        out_specs = {kk: P("reads") for kk in keys}
        m = shard_map(local, mesh=mesh,
                      in_specs=(P("genome"), P("genome"), P("genome"),
                                P("genome"), P("reads", None),
                                P("reads")),
                      out_specs=out_specs)
        return m(flat2d, flatlen, codes, pos, reads, lengths)

    return jax.jit(fn)


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
