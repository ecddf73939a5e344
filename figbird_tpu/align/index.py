"""K-mer index over the (gapped) genome.

TPU-native replacement for ``bowtie2-build`` (RunFigbird.sh:277,330): instead
of an FM index walked by a serial CPU search, we build a *sorted k-mer table*
— ``(code, position)`` pairs sorted by code — that devices query with
``searchsorted`` (binary search vectorised over the whole read batch).

The genome is flattened with an N-run pad between contigs so alignment windows
can never silently span a contig boundary (N never scores as a match).
Positions stored in the table are *padded-flat* coordinates; helpers convert
to (contig, local_pos).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..dtypes import GAP_CODE
from ..genome import Genome


@dataclass
class KmerIndex:
    k: int
    flat: np.ndarray          # (Gpad,) int8 padded genome
    offsets: np.ndarray       # (n_contigs,) int64 start of each contig in flat
    contig_lengths: np.ndarray  # (n_contigs,) int64
    sorted_codes: np.ndarray  # (M,) int64 k-mer codes, ascending
    sorted_pos: np.ndarray    # (M,) int64 padded-flat position of each k-mer
    pad: int
    prefix_bases: int = 0         # p: bucket = first p bases of the code
    bucket_starts: np.ndarray = None  # (4^p + 1,) int32 offsets into the table

    def build_buckets(self) -> None:
        """Direct-addressed prefix-bucket table over the sorted code array.

        Binary search on device costs ~23 serial gather steps; a bucket
        lookup is 2 row gathers.  p is sized for ~0.5 load factor, capped at
        13 bases (a 268 MB table) — beyond that the in-bucket suffix scan
        (core._seed_hits) caps recall per bucket, which repeat_limit would
        mostly skip anyway.
        """
        m = max(len(self.sorted_codes), 1)
        p = _prefix_bases_for(m, self.k)
        nb = 4 ** p
        prefix = (self.sorted_codes >> (2 * (self.k - p))).astype(np.int64)
        counts = np.bincount(prefix, minlength=nb)
        starts = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        self.prefix_bases = p
        self.bucket_starts = starts.astype(np.int32)

    @property
    def n_contigs(self) -> int:
        return len(self.offsets)

    def flat_to_contig(self, flat_pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Convert padded-flat positions to (contig_index, local_pos).

        Positions inside inter-contig padding clamp into the nearest preceding
        contig (callers mask those out via alignment validity).
        """
        flat_pos = np.asarray(flat_pos)
        ci = np.searchsorted(self.offsets, flat_pos, side="right") - 1
        ci = np.clip(ci, 0, self.n_contigs - 1)
        return ci, flat_pos - self.offsets[ci]

    def contig_to_flat(self, contig: np.ndarray, pos: np.ndarray) -> np.ndarray:
        return self.offsets[np.asarray(contig)] + np.asarray(pos)


def _rolling_codes(seq: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorised k-mer codes: ``code[i] = sum_j seq[i+j] * 4**(k-1-j)``.

    Returns (codes int64 (n-k+1,), valid bool) where valid means the window
    contains no N.
    """
    n = len(seq)
    if n < k:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool)
    m = n - k + 1
    codes = np.zeros(m, dtype=np.int64)
    valid = np.ones(m, dtype=bool)
    s = seq.astype(np.int64)
    for j in range(k):
        w = s[j : j + m]
        codes = codes * 4 + np.minimum(w, 3)
        valid &= w < 4
    return codes, valid


def _prefix_bases_for(m: int, k: int) -> int:
    """Bucket prefix length for ~0.5 load factor (see build_buckets)."""
    p = int(np.ceil(np.log(max(2.0 * m, 4.0)) / np.log(4.0)))
    return min(max(p, 6), 13, k)


def build_index(genome: Genome, k: int = 15, pad: int = 256,
                device_tables: bool = False) -> KmerIndex:
    """Build the sorted k-mer table over all contigs.

    Windows containing N are excluded (the draft's gaps are N-runs, so gap
    interiors are never seed targets — seeds land on flanks, exactly the
    behaviour needed for gap-spanning partial reads).

    ``device_tables=True`` defers the sort + bucket build to the device
    (:func:`build_device_tables`, done lazily by the Aligner): only the flat
    genome is uploaded, and the host pays no argsort.  Host ``sorted_codes``
    stay None in that mode (the golden/SAM and genome-sharded paths need the
    host arrays and use the default).
    """
    lens = genome.lengths
    offsets = np.zeros(len(lens), dtype=np.int64)
    cursor = pad
    parts = [np.full(pad, GAP_CODE, dtype=np.int8)]
    for i, c in enumerate(genome.contigs):
        offsets[i] = cursor
        parts.append(np.asarray(c, dtype=np.int8))
        parts.append(np.full(pad, GAP_CODE, dtype=np.int8))
        cursor += len(c) + pad
    flat = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int8)

    if device_tables:
        # valid (N-free) window count for bucket sizing: non-N runs of
        # length r contribute r-k+1 windows each (run enumeration is ~50x
        # cheaper than a windowed cumsum compare at genome scale)
        good = flat < 4
        d = np.diff(good.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if good[:1].any():
            starts = np.concatenate([[0], starts])
        if good[-1:].any():
            ends = np.concatenate([ends, [len(flat)]])
        runs = ends - starts
        n_valid = int(np.maximum(runs - k + 1, 0).sum())
        idx = KmerIndex(
            k=k, flat=flat, offsets=offsets, contig_lengths=lens,
            sorted_codes=None, sorted_pos=None, pad=pad,
            prefix_bases=_prefix_bases_for(n_valid, k))
        return idx

    # native C++ fast path: rolling codes + sort over the padded flat array
    # (N padding between contigs invalidates boundary-spanning windows)
    if k <= 15:
        from ..io.native import native_kmer_table

        res = native_kmer_table(flat, k)
        if res is not None:
            codes32, pos32 = res
            return KmerIndex(
                k=k, flat=flat, offsets=offsets, contig_lengths=lens,
                sorted_codes=codes32.astype(np.int64),
                sorted_pos=pos32.astype(np.int64), pad=pad,
            )

    code_chunks: list[np.ndarray] = []
    pos_chunks: list[np.ndarray] = []
    for i, c in enumerate(genome.contigs):
        codes, valid = _rolling_codes(np.asarray(c, dtype=np.int8), k)
        idx = np.flatnonzero(valid)
        code_chunks.append(codes[idx])
        pos_chunks.append(idx.astype(np.int64) + offsets[i])

    codes = np.concatenate(code_chunks) if code_chunks else np.zeros(0, np.int64)
    pos = np.concatenate(pos_chunks) if pos_chunks else np.zeros(0, np.int64)
    order = np.argsort(codes, kind="stable")
    return KmerIndex(
        k=k,
        flat=flat,
        offsets=offsets,
        contig_lengths=lens,
        sorted_codes=codes[order],
        sorted_pos=pos[order],
        pad=pad,
    )


def build_device_tables(flat: np.ndarray, k: int, prefix_bases: int):
    """Build the sorted k-mer table + prefix buckets ON DEVICE.

    Replaces the host argsort + 36 MB table H2D (~2 s per iteration at
    E. coli scale) with one 4.7 MB genome upload and a device sort:

      codes[i] via k shifted adds; N-windows get a sentinel (2^30 >= 4^15)
      so a stable argsort pushes them to the tail with valid entries in the
      same relative order as the host build; sorted_pos IS the argsort
      permutation; bucket starts by scatter-add + cumsum.

    Returns (tables dict of device arrays shaped like core's as_rows
    layouts, n_valid) — hit enumeration is identical to the host path.
    """
    import jax
    import jax.numpy as jnp

    n = len(flat)
    rows = (n + 127) // 128 + 2
    flat_p = np.full(rows * 128, GAP_CODE, np.int8)
    flat_p[:n] = flat
    nb = 4 ** prefix_bases
    shift = 2 * (k - prefix_bases)

    @jax.jit
    def build(fl):
        x = jnp.minimum(fl, 3).astype(jnp.int32)
        validN = (fl < 4).astype(jnp.int32)
        m = fl.shape[0]
        codes = jnp.zeros(m, jnp.int32)
        ok = jnp.ones(m, jnp.int32)
        for j in range(k):
            sh = jnp.concatenate([x[j:], jnp.zeros(j, jnp.int32)])
            codes = codes * 4 + sh
            shv = jnp.concatenate([validN[j:], jnp.zeros(j, jnp.int32)])
            ok = ok * shv
        last = m - k  # windows starting beyond m-k run off the array
        ok = ok * (jnp.arange(m) <= last)
        SENT = jnp.int32(1 << 30)
        keyed = jnp.where(ok > 0, codes, SENT)
        order = jnp.argsort(keyed, stable=True).astype(jnp.int32)
        scodes = keyed[order]
        n_valid = jnp.sum(ok)
        prefix = jnp.where(scodes < SENT, scodes >> shift, nb)
        counts = jnp.zeros(nb + 1, jnp.int32).at[prefix].add(1)
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts[:nb])])
        return scodes, order, starts, n_valid

    scodes, spos, starts, n_valid = build(jnp.asarray(flat_p))

    def as_rows_dev(a, fill):
        ln = a.shape[0]
        r = (ln + 127) // 128 + 2
        padn = r * 128 - ln
        return jnp.concatenate(
            [a, jnp.full(padn, fill, a.dtype)]).reshape(r, 128)

    tables = dict(
        starts2d=as_rows_dev(starts, 0),
        codes2d=as_rows_dev(scodes, 0),
        pos2d=as_rows_dev(spos, 0),
    )
    # n_valid stays a DEVICE scalar: int() here would synchronise on the
    # whole sort pipeline (~0.5 s on a tunnel-attached chip) that callers
    # otherwise overlap with the first align batches
    return tables, n_valid
