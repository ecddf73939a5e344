"""Outer pipeline driver.

Replaces RunFigbird.sh: the iteration schedule (522-775), per-iteration tool
sequencing (run_bowtie 182-361 / run_bowtie_user 363-489), convergence gating
on the remaining-N flag (FillGaps.cpp:917-926), and artifact emission
(gapInfo.txt / gapout_<n>.txt / per-iteration filled FASTA).

One iteration =
  1. [itr 1] flank trim (FlankTrim.cpp) applied to the working genome;
  2. model/partial pass: local-align the minimum-insert library against the
     current genome, learn the insert/error model from unique concordant
     pairs, and triage clipped reads into partial bundles;
  3. [unmapped mode] end-to-end-align the target library (insert bound
     1.15x its mean) — optionally against the gapped-scaffold-reduced genome
     (Reduce_SCF.cpp) — relearn the insert model from its own concordant
     pairs when plentiful (the jump pre-pass, Preprocess.cpp:2313-2445, with
     the <1000-line myout fallback RunFigbird.sh:342-347), and triage
     one-anchored mates into unmapped bundles;
  4. batched gap-fill EM + scaffold splice; Ncount convergence flag.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .align import Aligner, AlignParams, build_index, build_pair_table
from .align.core import e2e_params
from .config import INSERT_FRAC, FigbirdConfig
from .dtypes import N, decode
from .genome import Genome
from .io.fasta import read_fasta, write_fasta
from .io.fastq import ReadBatch, read_fastq
from .model.error_model import (
    ErrorModel,
    alignment_error_log10,
    collect_stats,
    compute_gap_prob_cutoff,
    finalize_model,
)
from .fill import fill_gaps
from .triage import GapBundle, Triage
from .utils.trace import StageTimer


@dataclass
class IterationStats:
    itr: int
    mode: str
    lib: int
    n_pairs: int
    n_model: int
    gaps: int
    filled: int
    n_before: int
    n_after: int
    seconds: float
    reads_per_sec: float = 0.0


@dataclass
class PipelineResult:
    genome: Genome
    iterations: list = field(default_factory=list)
    gap_history: list = field(default_factory=list)  # per-itr (gaps, strings)
    combined: list = field(default_factory=list)  # CombinedGap per orig gap

    @property
    def fillmore(self) -> bool:
        return self.iterations[-1].n_after not in (0, self.iterations[-1].n_before) \
            if self.iterations else True


def _oriented_rows(batch: ReadBatch, align: dict, rows: np.ndarray) -> np.ndarray:
    """Reference-oriented sequences for a row subset only.

    Orienting the full batch costs ~0.9 s per 460k reads per mate; the model
    set plus triage candidates touch a fraction of rows, so orientation is
    done lazily on the selected rows.
    """
    from .dtypes import COMPLEMENT, GAP_CODE

    seq = batch.seq[rows]
    lens = batch.length[rows]
    st = align["strand"][rows]
    n, L = seq.shape
    comp = np.asarray(COMPLEMENT, np.int8)[seq]
    src = lens[:, None] - 1 - np.arange(L)[None, :]
    rc = np.where(src >= 0,
                  np.take_along_axis(comp, np.clip(src, 0, L - 1), axis=1),
                  GAP_CODE).astype(np.int8)
    return np.where(st[:, None] == 1, rc, seq)


def _model_indel_events(m, a1, a2, r1, r2):
    """Indel events from the banded tier for model-set reads
    (processErrorTypes I/D accounting, Figbird.cpp:339-372)."""
    ins_ev, del_ev = [], []
    for a, rb in ((a1, r1), (a2, r2)):
        for row, tb in a.get("indel_detail", {}).items():
            if not m[row]:
                continue
            sr, rl = int(a["strand"][row]), int(rb.length[row])
            ins_ev += [(c, n, sr, rl) for c, n in tb["ins_events"]]
            del_ev += [(c, n, sr, rl) for c, n in tb["del_events"]]
    return (np.array(ins_ev, np.int64).reshape(-1, 4),
            np.array(del_ev, np.int64).reshape(-1, 4))


def _learn_model_host(idx, pt, a1, a2, r1, r2, contig_lengths, partial_flag,
                      partial_len, input_mean=0.0, holds_end=True
                      ) -> tuple[ErrorModel, int]:
    """Host-side model learning (SAM-injected alignments, golden path)."""
    m = pt.model
    n_model = int(m.sum())
    rows = np.flatnonzero(m)
    o1m, o2m = _oriented_rows(r1, a1, rows), _oriented_rows(r2, a2, rows)
    reads = np.concatenate([o1m, o2m])
    lens = np.concatenate([r1.length[m], r2.length[m]])
    wins = np.concatenate([a1["pos"][m], a2["pos"][m]]).astype(np.int64)
    strands = np.concatenate([a1["strand"][m], a2["strand"][m]])
    mism = np.concatenate([a1["mism"][m], a2["mism"][m]])
    clips_s = np.concatenate([a1["clip_start"][m], a2["clip_start"][m]])
    clips_e = np.concatenate([a1["clip_end"][m], a2["clip_end"][m]])
    clr = contig_lengths[np.concatenate([pt.contig[m, 0], pt.contig[m, 1]])]
    st = collect_stats(idx.flat, reads, lens, wins, strands, mism,
                       inserts=np.concatenate([pt.insert[m],
                                               np.zeros(n_model, np.int64)]),
                       contig_len_of_read=np.concatenate(
                           [clr[:n_model], np.zeros(n_model)]),
                       input_mean=input_mean,
                       max_read_length=int(max(r1.seq.shape[1], r2.seq.shape[1])),
                       indel_events=_model_indel_events(m, a1, a2, r1, r2),
                       clip_start=clips_s, clip_end=clips_e)
    model = finalize_model(st, contig_lengths, partial_flag=partial_flag,
                           partial_len=partial_len)
    # gap-prob cutoff from mate2 error probabilities (computeLikelihood side
    # effect, Figbird.cpp:1312-1322).  The reference's per-pair flush means
    # the LAST myout pair is never counted into gapProbs (1303-1338 flushes
    # the previous pair only; the post-loop flush skips gapProbs).
    L2 = r2.seq.shape[1]
    j = np.arange(L2)
    win2 = a2["pos"][m].astype(np.int64)
    from2 = idx.flat[win2[:, None] + j[None, :]]
    lg2 = alignment_error_log10(model, o2m, r2.length[m], a2["strand"][m],
                                a2["mism"][m], from2,
                                clip_start=a2["clip_start"][m],
                                clip_end=a2["clip_end"][m])
    if holds_end and len(lg2):
        lg2 = lg2[:-1]
    from .model.error_model import gap_prob_hist
    hist = gap_prob_hist(lg2)
    model.gap_prob_cutoff = compute_gap_prob_cutoff(model, hist=hist)
    model.snapshot = (st, hist)
    return model, n_model


def _indel_mism_rows(a: dict, rows: np.ndarray, L: int) -> np.ndarray:
    """Mismatch masks for indel-tier rows from their banded tracebacks
    (the production align pass skips the full mism D2H)."""
    if "mism" in a:
        return a["mism"][rows]
    out = np.zeros((len(rows), L), bool)
    det = a.get("indel_detail", {})
    for i, row in enumerate(rows):
        tb = det.get(int(row))
        if tb is not None:
            mm = np.asarray(tb["mism"], bool)
            n = min(len(mm), L)
            out[i, :n] = mm[:n]
    return out


def _learn_model_device(idx, pt, a1, a2, r1, r2, contig_lengths, partial_flag,
                        partial_len, aligner, input_mean=0.0, holds_end=True
                        ) -> tuple[ErrorModel, int]:
    """Device-side model learning over the aligner's resident read batches.

    Sufficient statistics are masked device sums (model/device_stats.py) —
    collective merge point #1 of SURVEY §5 in the production path; only the
    rare indel-tier rows (gapless window compare invalid) fall back to the
    host ``collect_stats`` on their small subset.
    """
    from .model.error_model import ModelStats

    m = np.asarray(pt.model)
    n_model = int(m.sum())
    Lmax = int(max(r1.seq.shape[1], r2.seq.shape[1]))
    st = ModelStats(Lmax)

    # insert histogram (pair-level, host: one bincount over the model pairs)
    ins = np.asarray(pt.insert)[m]
    clr = contig_lengths[np.asarray(pt.contig)[m, 0]]
    sel = (ins > 0) & (clr > input_mean)
    insv = ins[sel]
    st.discarded += int((insv > st.max_insert_size).sum())
    insv = insv[insv <= st.max_insert_size]
    st.insert_counts += np.bincount(
        np.minimum(insv, st.max_insert_size - 1),
        minlength=st.max_insert_size)[: st.max_insert_size]

    zero = np.zeros(len(m), bool)
    # both mates' device stats dispatch together and share one D2H fetch
    jobs = []
    for a, rb in ((a1, r1), (a2, r2)):
        indel = np.asarray(a.get("indel", zero))
        jobs.append((a["stats_handle"], a["pos"], a["strand"], m & ~indel,
                     a["clip_start"], a["clip_end"]))
    dsums = aligner.model_stats_pair(jobs)
    for (a, rb), dsum in zip(((a1, r1), (a2, r2)), dsums):
        indel = np.asarray(a.get("indel", zero))
        dev_mask = m & ~indel
        L = rb.seq.shape[1]
        st.error_pos[:L] += np.asarray(dsum["error_pos"], np.int64)[:L]
        st.error_types += np.asarray(dsum["error_types"], np.int64)
        st.base_counts += np.asarray(dsum["base_counts"], np.int64)
        st.unique_mapped += int(dsum["n"])
        lens_m = rb.length[dev_mask]
        st.read_lengths += np.bincount(
            np.clip(lens_m - 1, 0, Lmax - 1), minlength=Lmax)[:Lmax]
        from .model.error_model import add_clip_events
        add_clip_events(st, a["clip_start"][dev_mask],
                        a["clip_end"][dev_mask], a["strand"][dev_mask],
                        rb.length[dev_mask])
        rows = np.flatnonzero(m & indel)
        if rows.size:  # indel rows: host stats from the banded tracebacks
            o = _oriented_rows(rb, a, rows)
            sti = collect_stats(
                idx.flat, o, rb.length[rows],
                a["pos"][rows].astype(np.int64), a["strand"][rows],
                _indel_mism_rows(a, rows, rb.seq.shape[1]),
                inserts=np.zeros(rows.size, np.int64),
                max_read_length=Lmax,
                clip_start=a["clip_start"][rows], clip_end=a["clip_end"][rows])
            st = st.merge(sti)

    ins_ev, del_ev = _model_indel_events(m, a1, a2, r1, r2)
    for ev, pos_hist, len_hist in ((ins_ev, st.in_pos, st.in_lengths),
                                   (del_ev, st.del_pos, st.del_lengths)):
        if not len(ev):
            continue
        cyc, ln, ev_strand, rlen = ev.T
        cyc = np.where(ev_strand == 0, cyc, rlen - cyc - 1)
        pos_hist += np.bincount(np.clip(cyc, 0, Lmax - 1),
                                minlength=Lmax)[:Lmax]
        len_hist += np.bincount(np.clip(ln - 1, 0, Lmax - 1),
                                minlength=Lmax)[:Lmax]

    # merge point #1 (SURVEY §5): all-reduce sufficient statistics across
    # hosts before finalisation — the model is learned once, globally
    # (replacing Figbird.cpp:7118-7132's per-worker redundant re-learn)
    from .parallel.distributed import allgather_obj, allreduce_stats, is_distributed

    st = allreduce_stats(st)
    if is_distributed():
        n_model = int(sum(allgather_obj(n_model)))
    model = finalize_model(st, contig_lengths, partial_flag=partial_flag,
                           partial_len=partial_len)

    indel2 = np.asarray(a2.get("indel", zero))
    # computeLikelihood's per-pair flush never counts the LAST myout pair
    # into gapProbs (Figbird.cpp:1303-1338 flushes the previous pair; the
    # post-loop flush skips the histogram) — drop the final model pair on
    # the process holding the global end of the read set
    m_hist = m
    if holds_end and m.any():
        m_hist = m.copy()
        m_hist[np.flatnonzero(m)[-1]] = False
    mask2 = m & ~indel2
    lg = aligner.model_err_log10(a2["stats_handle"], a2["pos"], a2["strand"],
                                 mask2, model, clip_s=a2["clip_start"],
                                 clip_e=a2["clip_end"])
    vals = lg[m_hist & ~indel2]
    rows2 = np.flatnonzero(m_hist & indel2)
    if rows2.size:
        o2 = _oriented_rows(r2, a2, rows2)
        L2 = r2.seq.shape[1]
        from2 = idx.flat[a2["pos"][rows2].astype(np.int64)[:, None]
                         + np.arange(L2)[None, :]]
        vals = np.concatenate([vals, alignment_error_log10(
            model, o2, r2.length[rows2], a2["strand"][rows2],
            _indel_mism_rows(a2, rows2, L2), from2,
            clip_start=a2["clip_start"][rows2],
            clip_end=a2["clip_end"][rows2])])
    from .model.error_model import gap_prob_hist
    hist = gap_prob_hist(vals)
    if is_distributed():
        hist = np.sum(allgather_obj(hist), axis=0)
    model.gap_prob_cutoff = compute_gap_prob_cutoff(model, hist=hist)
    model.snapshot = (st, hist)  # myout_temp-equivalent (RunFigbird.sh:287)
    return model, n_model


def _learn_model(idx, pt, a1, a2, r1, r2, contig_lengths, partial_flag,
                 partial_len, input_mean=0.0, aligner=None, holds_end=True
                 ) -> tuple[ErrorModel, int]:
    if int(pt.model.sum()) == 0:
        return None, 0
    if (aligner is not None and "stats_handle" in a1
            and "stats_handle" in a2):
        return _learn_model_device(idx, pt, a1, a2, r1, r2, contig_lengths,
                                   partial_flag, partial_len, aligner,
                                   input_mean, holds_end)
    return _learn_model_host(idx, pt, a1, a2, r1, r2, contig_lengths,
                             partial_flag, partial_len, input_mean, holds_end)


class Pipeline:
    """Stateful pipeline over in-memory genome + read libraries."""

    def __init__(self, cfg: FigbirdConfig, genome: Genome,
                 libs: list[tuple[ReadBatch, ReadBatch]],
                 workdir: str | Path | None = None,
                 align_params: AlignParams = AlignParams(),
                 use_genome_reduction: bool = True,
                 use_read_reduction: bool = True,
                 min_model_pairs: int = 500,
                 fill_kwargs: dict | None = None,
                 aligner_kwargs: dict | None = None,
                 mesh=None, distributed: bool | None = None):
        """``mesh``: optional jax.sharding.Mesh with a ``reads`` axis; when
        given, alignment batches and fill instances run data-parallel over it
        (index/model replicated — SURVEY §2c SPMD mapping).  Results are
        bit-identical to single-device (tests/test_parallel.py).

        ``distributed``: multi-host mode (jax.distributed initialised, one
        process per host).  Each process keeps a contiguous shard of every
        read library (genome/index replicated per host), learns the model
        via a cross-host stats all-reduce, unions per-gap bundles, fills a
        strided gap subset and all-gathers the strings — bit-identical to a
        single-process run (tests/test_distributed.py).  Default: auto
        (on when jax.process_count() > 1)."""
        from .parallel import distributed as dist

        cfg.validate()
        self.cfg = cfg
        self.mesh = mesh
        self.dist = dist.is_distributed() if distributed is None \
            else distributed
        self.genome = genome
        self.libs = []
        self._holds_end: list[bool] = []  # owns the global last read pair
        for lib, (r1, r2) in zip(cfg.read_pairs, libs):
            if lib.is_reverse:  # Reverse.cpp: RC both files of RF libraries
                r1, r2 = r1.revcomp(), r2.revcomp()
            holds_end = True
            if self.dist:  # host-level read decomposition
                n_total = len(r1)
                sl = dist.shard_reads(n_total)
                holds_end = sl.stop == n_total and sl.start < n_total
                r1, r2 = r1.take(np.arange(sl.start, sl.stop)), \
                    r2.take(np.arange(sl.start, sl.stop))
            self.libs.append((r1, r2))
            self._holds_end.append(holds_end)
        self.workdir = Path(workdir) if workdir else None
        if self.workdir:
            for d in ("Filled_Scaffolds", "Individual_gaps", "Temp"):
                (self.workdir / d).mkdir(parents=True, exist_ok=True)
        self.align_params = align_params
        self.use_genome_reduction = use_genome_reduction
        self.min_model_pairs = min_model_pairs
        self.fill_kwargs = fill_kwargs or {}
        self.aligner_kwargs = aligner_kwargs or {}
        self.use_read_reduction = use_read_reduction
        self._reduced: set[int] = set()
        self.itr = 0
        self.saved_model: ErrorModel | None = None
        self.saved_n_model: int = 0
        self.result = PipelineResult(genome)
        self._aligned_reads = 0
        self._align_seconds = 0.0
        self.timer = StageTimer()

    # ------------------------------------------------------------------
    def _align_lib(self, genome: Genome, lib_i: int, max_insert: int,
                   end_to_end: bool = False):
        """``end_to_end=True`` is the unmapped-pass preset: default (non
        -local) bowtie2 semantics with the -X maxD2 insert bound
        (RunFigbird.sh:329-333) — no soft clips, so the pass's model set
        excludes clipped reads exactly as the reference does."""
        from dataclasses import replace as _replace

        r1, r2 = self.libs[lib_i]
        t0 = time.time()
        gshard = (self.mesh is not None
                  and self.mesh.shape.get("genome", 1) > 1)
        # contig-range sharding derives per-shard LOCAL tables from the flat
        # alone (parallel/sharded.split_index_by_contig) — skip the host
        # argsort of the global table, which at >2^31 bases would cost tens
        # of GB and minutes (BASELINE config 5)
        from .align.core import host_flat_ok as _hfok

        total_bases = sum(int(l) for l in genome.lengths)
        contig_big = gshard and (
            self.aligner_kwargs.get("genome_shard") == "contig"
            or not _hfok(total_bases))
        idx = build_index(genome, k=15,
                          device_tables=(not gshard) or contig_big)
        self.timer.add("index_build", time.time() - t0)
        params = e2e_params(self.align_params) if end_to_end \
            else self.align_params
        # model learning runs on device; skip the mismatch-mask D2H.
        # Exception: genomes past the replicated-flat budget (contig-sharded,
        # no device stats) fall back to host learning, which needs the mask.
        if _hfok(total_bases):
            params = _replace(params, want_mism=False)
        t0 = time.time()
        al = Aligner(idx, params, mesh=self.mesh,
                     **self.aligner_kwargs)
        self.timer.add("aligner_init", time.time() - t0)
        t0 = time.time()
        a1, a2 = al.align_many([(r1.seq, r1.length), (r2.seq, r2.length)],
                               keep_stats=True)
        self._align_seconds += time.time() - t0
        self._aligned_reads += 2 * len(r1)
        t0 = time.time()
        pt = build_pair_table(idx, a1, a2, r1.length, r2.length, max_insert)
        self.timer.add("pair_table", time.time() - t0)
        return idx, a1, a2, pt, al

    # ------------------------------------------------------------------
    @staticmethod
    def _refinalize(model: ErrorModel, genome: Genome, partial_flag: bool,
                    partial_len: int) -> ErrorModel:
        """Re-derive a model from a saved myout snapshot under the current
        iteration's flags (Figbird recomputes thresholds per invocation from
        whatever myout file it is handed)."""
        st, hist = getattr(model, "snapshot", (None, None))
        if st is None:
            return model
        out = finalize_model(st, genome.lengths, partial_flag=partial_flag,
                             partial_len=partial_len)
        out.gap_prob_cutoff = compute_gap_prob_cutoff(out, hist=hist)
        out.snapshot = (st, hist)
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _reduction_keep(pt) -> np.ndarray:
        """Read reduction keep-mask (Preprocess.cpp:2273-2302, reWriteReadset
        1696-1731): later iterations only realign pairs that were discordant/
        mixed or partially (clip-)aligned; perfect-cigar concordant pairs are
        dropped (model learning then relies on the saved model, mirroring the
        reference's myout_temp.sam fallback, RunFigbird.sh:287-300)."""
        clipped = (pt.clip_start > 0) | (pt.clip_end > 0)
        perfect = pt.concordant & ~clipped[:, 0] & ~clipped[:, 1]
        return ~perfect

    # ------------------------------------------------------------------
    def run_iteration(self, mode: str, lib_i: int) -> IterationStats:
        """One filling iteration; mode 'p' (partial) or 'u' (unmapped)."""
        self.itr += 1
        t0 = time.time()
        cfgp = self.cfg.parameters
        genome = self.genome
        if self.itr == 1 and cfgp.trim_len > 0:
            genome = genome.flank_trim(
                cfgp.trim_len, self.cfg.read_pairs[lib_i].max_read_length)
        n_before = genome.count_n()
        gaps = genome.find_gaps()

        # --- model/partial pass: minimum-insert library, local alignment ----
        mi = self.cfg.min_isz_index
        m_lib = self.cfg.read_pairs[mi]
        maxD1 = m_lib.avg_insert_size
        with self.timer.stage("align", 2 * len(self.libs[mi][0])):
            idx, a1, a2, pt, al = self._align_lib(genome, mi, max_insert=maxD1)
        partial_len = m_lib.max_read_length
        r1, r2 = self.libs[mi]
        with self.timer.stage("model"):
            if self.itr > 1 and self.saved_model is not None:
                # iterations > 1 use ITERATION 1's myout snapshot
                # (myout_temp, RunFigbird.sh:287-300, 311-315): the reduced
                # read set would starve the model otherwise.  Unmapped
                # iterations replace this with the e2e pass's model below.
                model = self._refinalize(self.saved_model, genome,
                                         partial_flag=(mode == "p"),
                                         partial_len=partial_len)
                n_model = self.saved_n_model
            else:
                model, n_model = _learn_model(
                    idx, pt, a1, a2, r1, r2, genome.lengths,
                    partial_flag=(mode == "p"), partial_len=partial_len,
                    input_mean=(m_lib.avg_insert_size
                                if cfgp.set_inputmean else 0.0), aligner=al,
                    holds_end=self._holds_end[mi])
                if model is None or n_model < self.min_model_pairs:
                    model = self.saved_model
                    if model is None:
                        raise RuntimeError(
                            "no model could be learned (too few pairs)")
                    model = self._refinalize(model, genome,
                                             partial_flag=(mode == "p"),
                                             partial_len=partial_len)
                    n_model = self.saved_n_model
                elif self.saved_model is None:
                    self.saved_model = model  # the iteration-1 snapshot
                    self.saved_n_model = n_model

        with self.timer.stage("triage"):
            tri = Triage(gaps, max_distance=maxD1,
                         read_mean=m_lib.avg_insert_size, is_jump=False)
            tri.collect_partial(pt, r1, r2, align1=a1, align2=a2)
        bundles = tri.bundles
        if self.dist:  # merge point #2a: cross-host bundle union
            from .parallel.distributed import merge_bundles

            bundles = merge_bundles(bundles)
        n_pairs = len(r1)
        reductions: dict[int, np.ndarray] = {}
        if self.use_read_reduction and mi not in self._reduced:
            reductions[mi] = self._reduction_keep(pt)

        # --- unmapped pass ---------------------------------------------------
        if mode == "u":
            t_lib = self.cfg.read_pairs[lib_i]
            maxD2 = int(t_lib.avg_insert_size * INSERT_FRAC)
            genome2 = genome
            gaps2 = gaps
            remap = None
            if self.use_genome_reduction and not t_lib.is_jump:
                genome2, remap = genome.reduce_to_gapped()
                gaps2 = genome2.find_gaps()
            idx2, b1, b2, pt2, al2 = self._align_lib(genome2, lib_i,
                                                     max_insert=maxD2,
                                                     end_to_end=True)
            n_pairs += len(self.libs[lib_i][0])
            # jump pre-pass (Preprocess.cpp:2313-2445): model relearn from the
            # e2e pass's own concordant pairs; its measured insert mean (not
            # the configured one) drives checkPos insert geometry
            read_mean = float(t_lib.avg_insert_size)
            m2, nm2 = _learn_model(
                idx2, pt2, b1, b2, *self.libs[lib_i], genome2.lengths,
                partial_flag=False, partial_len=partial_len,
                input_mean=(t_lib.avg_insert_size if cfgp.set_inputmean
                            else 0.0), aligner=al2,
                holds_end=self._holds_end[lib_i])
            if m2 is not None and nm2 >= self.min_model_pairs:
                model = m2
                if maxD2 > 250:
                    read_mean = float(m2.insert_mean)
            elif self.saved_model is not None:
                # myout < 1000 lines: fall back to the iteration-1 snapshot
                # (RunFigbird.sh:342-347)
                model = self._refinalize(self.saved_model, genome,
                                         partial_flag=False,
                                         partial_len=partial_len)
            tri2 = Triage(gaps2, max_distance=maxD2,
                          read_mean=read_mean,
                          is_jump=t_lib.is_jump)
            tri2.collect_unmapped(pt2, *self.libs[lib_i])
            u_bundles = tri2.bundles
            if self.dist:
                from .parallel.distributed import merge_bundles

                u_bundles = merge_bundles(u_bundles)
            # merge unmapped bundles back into the full-genome gap list.
            # The 1:1 zip is valid because reduce_to_gapped keeps whole
            # contigs (exactly the N-bearing ones) in order, so the reduced
            # gap list equals the full one with contigs renumbered — assert
            # that correspondence via the remap instead of assuming it.
            if remap is not None:
                if len(gaps2) != len(gaps):
                    raise RuntimeError(
                        f"reduced genome gap count {len(gaps2)} != "
                        f"full genome {len(gaps)}")
                for g2, g in zip(gaps2, gaps):
                    if (int(remap[g2.contig]) != g.contig
                            or g2.start != g.start
                            or g2.length != g.length):
                        raise RuntimeError(
                            "reduced<->full gap correspondence broken: "
                            f"reduced ({g2.contig},{g2.start},{g2.length}) "
                            f"-> contig {int(remap[g2.contig])} vs full "
                            f"({g.contig},{g.start},{g.length})")
            for b2_, b in zip(u_bundles, bundles):
                b.u_seq, b.u_pos, b.u_rev = b2_.u_seq, b2_.u_pos, b2_.u_rev
            if (self.use_read_reduction and lib_i != mi
                    and lib_i not in self._reduced):
                reductions[lib_i] = self._reduction_keep(pt2)

        # --- fill + splice ---------------------------------------------------
        with self.timer.stage("fill", len(gaps)):
            if self.dist and len(gaps):
                # each host fills a strided gap subset; strings all-gather
                # (merge point #2b — replaces FillGaps' gapout file merge)
                from .parallel.distributed import (allgather_gap_strings,
                                                   my_gap_subset)

                sub = my_gap_subset(len(gaps))
                res = fill_gaps(
                    genome, [gaps[i] for i in sub],
                    [bundles[i] for i in sub], model,
                    partial_mode=(mode == "p"), partial_len=partial_len,
                    neg_overlap=cfgp.gaplen_negative_overlap,
                    mesh=self.mesh, **self.fill_kwargs)
                mine = {int(gi): (res.gap_strings[k], int(res.gaptofill[k]))
                        for k, gi in enumerate(sub)}
                allv = allgather_gap_strings(len(gaps), mine)
                res.gap_strings = [v[0] for v in allv]
                res.gaptofill = np.asarray([v[1] for v in allv], np.int64)
                res.placements = None  # per-host partial; not meaningful
                res.mim = None
            else:
                res = fill_gaps(
                    genome, gaps, bundles, model,
                    partial_mode=(mode == "p"), partial_len=partial_len,
                    neg_overlap=cfgp.gaplen_negative_overlap,
                    mesh=self.mesh,
                    **self.fill_kwargs,
                )
        with self.timer.stage("splice"):
            new_genome = genome.splice_gaps(
                gaps, res.gap_strings, list(res.gaptofill))
        n_after = new_genome.count_n()
        self.genome = new_genome
        self.result.genome = new_genome
        self.result.gap_history.append((gaps, res.gap_strings, res.gaptofill))
        self.last_fill_stats = res.stats  # bench/trace reporting

        for i, keep in reductions.items():
            ra, rb = self.libs[i]
            self.libs[i] = (ra.take(keep), rb.take(keep))
            self._reduced.add(i)

        if self.workdir:
            self._write_artifacts(gaps, res, new_genome, genome)

        stats = IterationStats(
            itr=self.itr, mode=mode, lib=lib_i, n_pairs=n_pairs,
            n_model=n_model, gaps=len(gaps), filled=res.stats["filled"],
            n_before=n_before, n_after=n_after, seconds=time.time() - t0,
        )
        self.result.iterations.append(stats)
        return stats

    # ------------------------------------------------------------------
    def _write_artifacts(self, gaps, res, new_genome, old_genome):
        from .fill.draw import render_gap, write_draw_file

        wd = self.workdir
        with open(wd / "Temp" / "gapInfo.txt", "w") as fh:
            for g in gaps:
                fh.write(f"{g.contig}\t{g.start}\t{g.length}\n")
        # interop stat files (Preprocess.cpp:2624-2629; FillGaps gaploads):
        # totalCount unCount maxReadLength MAX_FRAGMENT_SIZE; per-gap
        # gaptofill/perfect-read flags; the bucket assignment replaces the
        # thread loads
        mlib = self.cfg.read_pairs[self.cfg.min_isz_index]
        n_reads = 2 * sum(len(a) for a, _ in self.libs)
        (wd / "Temp" / "stat.txt").write_text(
            f"{n_reads} 0 {mlib.max_read_length} "
            f"{max(20000, 2 * mlib.avg_insert_size + 1)}")
        # gaptofill, perfectread_gap, perfectread_gaplen (Preprocess.cpp:
        # 2626-2629) — the MIM flags from plan_gaps/the banded tier
        mim = res.mim if res.mim is not None else np.zeros((len(gaps), 2),
                                                           np.int64)
        with open(wd / "Temp" / "stat2.txt", "w") as fh:
            for i, g in enumerate(gaps):
                fh.write(f"{int(res.gaptofill[i])}\t{int(mim[i, 0])}\t"
                         f"{int(mim[i, 1])}\n")
        with open(wd / "Temp" / "gaploads.txt", "w") as fh:
            shapes = res.stats.get("bucket_shapes", {})
            fh.write(f"{len(shapes)}\n")
            for key, cnt in shapes.items():
                fh.write(f"{key}\t{cnt}\n")
        if res.placements is not None:
            recs = []
            for i, (g, s) in enumerate(zip(gaps, res.gap_strings)):
                pl = res.placements[i]
                if not pl:
                    continue
                contig = old_genome.contigs[g.contig]
                lf = contig[max(g.start - 30, 0) : g.start]
                rf = contig[g.start + g.length : g.start + g.length + 30]
                recs.append(render_gap(i, g, s, pl, lf, rf))
            write_draw_file(
                wd / "Individual_gaps" / f"alignment_{self.itr}.txt", recs)
        with open(wd / "Individual_gaps" / f"gapout_{self.itr}.txt", "w") as fh:
            for i, (g, s) in enumerate(zip(gaps, res.gap_strings)):
                seq = decode(s) if len(s) else ""
                fh.write(f"{i}\t{g.contig}\t{g.start}\t{g.length}\t{len(s)}\t{seq}\n")
        write_fasta(wd / "Filled_Scaffolds" / f"{self.itr}filledContigs.fa",
                    new_genome.to_fasta())
        fillmore = 0 if new_genome.count_n() == 0 else 1
        (wd / "Temp" / "Ncount.txt").write_text(str(fillmore))

    # ------------------------------------------------------------------
    def run(self, max_iterations: int | None = None) -> PipelineResult:
        """Full schedule (RunFigbird.sh:534-775)."""
        cfg = self.cfg
        libs = cfg.read_pairs
        done = 0
        budget = max_iterations or 16

        def fillmore() -> bool:
            if not self.result.iterations:
                return True
            last = self.result.iterations[-1]
            return last.n_after > 0 and last.n_after != last.n_before

        def do(mode, lib_i) -> bool:
            nonlocal done
            if done >= budget:
                return False
            self.run_iteration(mode, lib_i)
            done += 1
            return fillmore()

        if cfg.parameters.default == 1:
            frag = [i for i, l in enumerate(libs) if not l.is_jump]
            jump = [i for i, l in enumerate(libs) if l.is_jump]
            if len(libs) == 2 and len(frag) == 1 and len(jump) == 1:
                # two-lib special case (534-595): 1p, 2u, 1p, 1u, 3p
                seq = ([("p", frag[0])] + [("u", jump[0])] * 2
                       + [("p", frag[0])] + [("u", jump[0])]
                       + [("p", frag[0])] * 3)
            else:
                p_libs = frag if frag else jump
                seq = []
                for i in jump:
                    seq += [("u", i)] * 2
                for i in p_libs:
                    seq += [("p", i)] * 2
                for i in jump:
                    seq += [("u", i)]
                for i in p_libs:
                    seq += [("p", i)] * 3
        else:
            order = sorted(range(len(libs)), key=lambda i: libs[i].serial_num)
            seq = []
            for i in order:
                for o in libs[i].order:
                    n = (libs[i].num_itr_partial if o == "p"
                         else libs[i].num_itr_unmapped)
                    seq += [(o, i)] * n

        for mode, lib_i in seq:
            if not do(mode, lib_i):
                break

        # final combine + copy (RunFigbird.sh:777-781, CombineGaps.cpp)
        from .combine import combine_gap_history, write_individual_gaps

        self.result.combined = combine_gap_history(self.result.gap_history)
        if self.workdir:
            write_individual_gaps(self.workdir / "Individual_gaps.txt",
                                  self.result.combined)
            with open(self.workdir / "Temp" / "combined_gapstring.txt", "w") as fh:
                for i, cg in enumerate(self.result.combined):
                    fh.write(f"{i}\t{len(cg.seq)}\t{decode(cg.seq)}\n")
            write_fasta(self.workdir / "FilledScaffolds_final.fa",
                        self.genome.to_fasta())
        return self.result


def run_from_config(cfg: FigbirdConfig, workdir: str | Path | None = None,
                    **kwargs) -> PipelineResult:
    genome = Genome.from_fasta(read_fasta(cfg.draft_genome))
    libs = [(read_fastq(l.path_1), read_fastq(l.path_2)) for l in cfg.read_pairs]
    pipe = Pipeline(cfg, genome, libs, workdir=workdir, **kwargs)
    return pipe.run()
