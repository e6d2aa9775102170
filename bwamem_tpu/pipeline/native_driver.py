"""Native host pipeline driver — chaining/planning/replay/SAM in C++
(csrc/mempipe.cpp), device extension between phases.

This is the production fast path: the role split matches the reference
system exactly — the host (C threads) does seeding, chaining and SAM
emission while the accelerator runs banded extension
(/root/reference/README.md:28 `-t $NTHREAD`; batch_manager.v keeps the
PE arrays fed).  The Python layer only owns FASTQ I/O, the jitted
Pallas kernel invocation, and final SAM-line assembly; everything else
crosses into libbwamem.so once per chunk phase.

Output parity: tests/test_native_pipe.py pins the SAM lines of this
path byte-identical to pipeline/driver.align_batch (the tested Python
oracle)."""

from __future__ import annotations

import ctypes

import numpy as np

from bwamem_tpu.config import MemOptions
from bwamem_tpu.io.fasta import Reference
from bwamem_tpu.io.sam import SamLine, SamRecord
from bwamem_tpu.pipeline.align import Region
from bwamem_tpu.pipeline.driver import _bucket
from bwamem_tpu import native

_P8 = ctypes.POINTER(ctypes.c_uint8)
_P32 = ctypes.POINTER(ctypes.c_int32)
_PU32 = ctypes.POINTER(ctypes.c_uint32)
_P64 = ctypes.POINTER(ctypes.c_int64)
_PD = ctypes.POINTER(ctypes.c_double)
_PI8 = ctypes.POINTER(ctypes.c_int8)


def available() -> bool:
    return native.get_lib() is not None


class NativePipeline:
    """One instance per (options, reference, index); align_chunk is the
    per-batch entry point."""

    def __init__(self, opt: MemOptions, ref: Reference, fm, po,
                 nthreads: int = 1, blk_l: int = 512, tracer=None,
                 bucket_split: bool = False):
        lib = native.get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self.lib = lib
        self.opt = opt
        self.ref = ref
        self.nthreads = max(int(nthreads), 1)
        self.blk_l = blk_l
        self.bucket_split = bucket_split  # two-dispatch qmax/tmax
        #   bucketing of the fused idx chunk (see _dispatch_fused_idx)
        self.split_min = None  # min small-bucket lanes to justify the
        #   second dispatch; None = max(quantum, Bp//8) (tests lower it)
        self.tracer = tracer  # utils.metrics.Tracer (the DSM/perf-counter
        #                       analogue, bwa_mem_sw.v:93-101); None = off
        self.seed_fn = None  # optional reads -> (n,4) int64 seed rows
        #                      (ops/smem_jax.make_device_seeder); None =
        #                      native C++ SMEM engine inside mp_chunk_start
        # keep every array alive for the lifetime of the handle
        self._opt_i = np.array([
            opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.w, opt.zdrop, opt.pen_clip5, opt.pen_clip3,
            opt.min_seed_len, opt.split_width, opt.max_occ,
            opt.max_chain_gap, opt.T, int(opt.flag_M), int(opt.flag_a), 5,
            opt.pen_unpaired, opt.max_matesw, opt.max_ins,
            int(opt.skip_pairing),
        ], np.int64)
        self._opt_d = np.array([
            opt.split_factor, opt.drop_ratio, opt.mask_level,
            opt.mapq_coef_len, opt.mapq_coef_fac,
            opt.pe_mean, opt.pe_std, float(opt.pe_max),
            float(opt.pe_min),
        ], np.float64)
        self._mat = np.ascontiguousarray(opt.mat, np.int8)
        self._pac = np.ascontiguousarray(ref.pac, np.uint8)
        self._off = np.array([c.offset for c in ref.contigs], np.int64)
        self._len = np.array([c.length for c in ref.contigs], np.int64)
        self._names = b"".join(c.name.encode() + b"\0" for c in ref.contigs)
        self._C = np.ascontiguousarray(po.C, np.int64)
        self._occ = np.ascontiguousarray(po.occ_rows, np.int32)
        self._pk = np.ascontiguousarray(po.pk_rows, np.uint32)
        self._va = np.ascontiguousarray(po.va_rows, np.uint32)
        self._ssa = np.ascontiguousarray(fm.ssa, np.int64)
        self.h = lib.mp_new(
            self._opt_i.ctypes.data_as(_P64),
            self._opt_d.ctypes.data_as(_PD),
            self._mat.ctypes.data_as(_PI8),
            self._pac.ctypes.data_as(_P8), len(self._pac),
            self._off.ctypes.data_as(_P64), self._len.ctypes.data_as(_P64),
            len(ref.contigs), self._names,
            self._C.ctypes.data_as(_P64), int(po.primary), int(po.n_rows),
            self._occ.ctypes.data_as(_P32), self._pk.ctypes.data_as(_PU32),
            self._va.ctypes.data_as(_PU32), self._ssa.ctypes.data_as(_P64),
            len(self._ssa), int(fm.sa_intv))

    def set_rg(self, rg_id: str) -> None:
        """-R: every record this handle emits carries RG:Z:<rg_id>."""
        self.lib.mp_set_rg(self.h, rg_id.encode())

    def __del__(self):
        if getattr(self, "h", None):
            self.lib.mp_free(self.h)
            self.h = None

    # -- device phase loop ------------------------------------------------

    def _chunk_start(self, reads):
        n = len(reads)
        L = max((len(r) for r in reads), default=1)
        mat = np.full((n, L), 4, np.uint8)
        qlen = np.zeros(n, np.int64)
        for i, r in enumerate(reads):
            mat[i, :len(r)] = r
            qlen[i] = len(r)
        self._reads_mat = mat  # keep alive: C++ keeps pointers
        self._reads_nib = None  # lazy per-chunk nibble-packed copy
        self._qlen = qlen
        if self.seed_fn is not None:
            # device-side seeding (ops/smem_jax): ship the seed rows in,
            # skip the C++ SMEM engine
            rows = np.ascontiguousarray(self.seed_fn(reads), np.int64)
            rc = self.lib.mp_chunk_start_seeded(
                self.h, mat.ctypes.data_as(_P8),
                qlen.ctypes.data_as(_P64), n, L,
                rows.ctypes.data_as(_P64), rows.shape[0], self.nthreads)
        else:
            rc = self.lib.mp_chunk_start(
                self.h, mat.ctypes.data_as(_P8),
                qlen.ctypes.data_as(_P64), n, L, self.nthreads)
        if rc != 0:
            raise RuntimeError("mp_chunk_start failed")

    def _nib_reads(self):
        """The chunk's read matrix nibble-packed (two base codes per
        byte), shape-bucketed so jit re-traces rarely; built once per
        chunk and shared by every resident-reference device protocol
        (fused extension, rescue waves, CIGAR rounds)."""
        if self._reads_nib is not None:
            return self._reads_nib
        nr, L = self._reads_mat.shape
        nb = _bucket(max(nr, 256),
                     (256, 512, 1024, 2048, 4096, 8192, 16384))
        Lb = _bucket(L)
        reads_p = np.full((nb, Lb), 4, np.uint8)
        reads_p[:nr, :L] = self._reads_mat
        self._reads_nib = (reads_p[:, 0::2]
                           | (reads_p[:, 1::2] << 4)).astype(np.int8)
        return self._reads_nib

    def _run_phase(self, raw_t_fn, label: str = ""):
        """Pass k=0 over the current task list, then the compacted k=1
        retry (the FPGA's internal band-doubling re-run,
        sw_extend.v:1963, re-batched)."""
        import time

        for k in (0, 1):
            B = self.lib.mp_task_count(self.h)
            if B == 0:
                return
            qmax_r = ctypes.c_int64()
            tmax_r = ctypes.c_int64()
            self.lib.mp_task_dims(self.h, ctypes.byref(qmax_r),
                                  ctypes.byref(tmax_r))
            qmax = _bucket(max(int(qmax_r.value), 1))
            tmax = _bucket(max(int(tmax_r.value), 1))
            Bp = _bucket(max(B, self.blk_l),
                         (512, 1024, 2048, 4096, 8192, 16384))
            # sharded backends need Bp % (blk_l * n_devices) == 0
            q = getattr(raw_t_fn, "bp_quantum", self.blk_l)
            if Bp % q:
                Bp = -(-Bp // q) * q
            # int8 base codes: the device converts to int32 on-chip; the
            # 4x smaller H2D transfer matters more than the convert (the
            # per-call transfer through the device tunnel is the
            # pipeline's limiting cost at large genomes)
            query_t = np.zeros((qmax, Bp), np.int8)
            target_t = np.zeros((tmax, Bp), np.int8)
            scal_t = np.zeros((8, Bp), np.int32)
            self.lib.mp_fill_tasks(
                self.h, k, query_t.ctypes.data_as(_PI8), qmax,
                target_t.ctypes.data_as(_PI8), tmax,
                scal_t.ctypes.data_as(_P32), Bp)
            grid = Bp // self.blk_l
            tl = scal_t[1].reshape(grid, self.blk_l)
            vq = scal_t[0].reshape(grid, self.blk_l)
            tmaxb = np.max(np.where(vq > 0, tl, 0), axis=1).astype(np.int32)
            t0 = time.time()
            out = np.ascontiguousarray(
                np.asarray(raw_t_fn(query_t, target_t, scal_t, tmaxb)),
                np.int32)
            if self.tracer is not None:
                from bwamem_tpu.utils.metrics import band_cells

                self.tracer.batch(
                    f"extend_{label}{k}", int(B),
                    band_cells(scal_t[0], scal_t[1], scal_t[2]),
                    time.time() - t0, Bp=Bp, qmax=qmax, tmax=tmax)
            nretry = self.lib.mp_pass_done(
                self.h, k, out.ctypes.data_as(_P32), Bp)
            if nretry == 0:
                return

    def _run_fused(self, fused_fn):
        """One device call for the whole chunk: the fused kernel runs
        L0/L-retry/R0/R-retry with in-lane h0 chaining (the four-pass
        protocol's round trips through the device tunnel were the
        single-chip limiter)."""
        import time

        n = int(self.lib.mp_prepare_fused(self.h))
        if n == 0:
            return
        d = [ctypes.c_int64() for _ in range(4)]
        self.lib.mp_fused_dims(self.h, *(ctypes.byref(x) for x in d))
        qmax_l = _bucket(max(int(d[0].value), 1))
        tmax_l = _bucket(max(int(d[1].value), 1))
        qmax_r = _bucket(max(int(d[2].value), 1))
        tmax_r = _bucket(max(int(d[3].value), 1))
        Bp = _bucket(max(n, self.blk_l),
                     (512, 1024, 2048, 4096, 8192, 16384))
        q = getattr(fused_fn, "bp_quantum", self.blk_l)
        if Bp % q:
            Bp = -(-Bp // q) * q
        idx_mode = getattr(fused_fn, "idx", False)
        scal = np.zeros((16, Bp), np.int32)
        if idx_mode:
            # resident-reference path: scalars only, no base payload
            self.lib.mp_fill_fused_idx(
                self.h, scal.ctypes.data_as(_P32), Bp)
        else:
            ql = np.zeros((qmax_l, Bp), np.int8)
            tl = np.zeros((tmax_l, Bp), np.int8)
            qr = np.zeros((qmax_r, Bp), np.int8)
            tr = np.zeros((tmax_r, Bp), np.int8)
            self.lib.mp_fill_fused(
                self.h, ql.ctypes.data_as(_PI8), qmax_l,
                tl.ctypes.data_as(_PI8), tmax_l, qr.ctypes.data_as(_PI8),
                qmax_r, tr.ctypes.data_as(_PI8), tmax_r,
                scal.ctypes.data_as(_P32), Bp)
        t0 = time.time()
        if idx_mode:
            out = self._dispatch_fused_idx(
                fused_fn, scal, Bp, (qmax_l, tmax_l, qmax_r, tmax_r))
        else:
            tmax2 = self._fused_tmax2(scal, Bp)
            out = np.ascontiguousarray(
                np.asarray(fused_fn(ql, tl, qr, tr, scal, tmax2)),
                np.int32)
        if self.tracer is not None:
            from bwamem_tpu.utils.metrics import band_cells

            cells = band_cells(scal[0], scal[1], scal[2]) + band_cells(
                scal[5], scal[6], scal[7])
            self.tracer.batch("extend_fused", n, cells, time.time() - t0,
                              Bp=Bp, qmax=max(qmax_l, qmax_r),
                              tmax=max(tmax_l, tmax_r))
        self.lib.mp_fused_done(self.h, out.ctypes.data_as(_P32), Bp)

    def _fused_tmax2(self, scal, Bp):
        """Per-block row-loop trip bounds [left, right] for the fused
        kernel's scalar prefetch (lanes arrive sorted by total rows, so
        blocks are length-homogeneous and short blocks exit early)."""
        grid = Bp // self.blk_l
        tmax2 = np.zeros((grid, 2), np.int32)
        tmax2[:, 0] = np.max(
            np.where(scal[0].reshape(grid, self.blk_l) > 0,
                     scal[1].reshape(grid, self.blk_l), 0), axis=1)
        tmax2[:, 1] = np.max(
            np.where(scal[5].reshape(grid, self.blk_l) > 0,
                     scal[6].reshape(grid, self.blk_l), 0), axis=1)
        return tmax2

    # finer shape ladder for the small-bucket dispatch: the row body's
    # vector cost scales with qmax (sublanes), so sub-128 buckets are
    # worth having here even though the global dims ladder starts at 128
    _SPLIT_BUCKETS = (32, 48, 64, 96, 128, 160, 192, 256, 320, 384,
                      512, 640, 768, 1024)

    def _dispatch_fused_idx(self, fused_fn, scal, Bp, dims):
        """Dispatch the resident-reference fused chunk — optionally as
        TWO kernel calls bucketed by task shape (self.bucket_split).

        One chunk-global (qmax, tmax) pads every lane to the longest
        task (production traces show qmax=160/tmax=320 while the median
        lane is far shorter — the row body's vector cost scales with
        qmax, so short lanes pay for the longest lane's sublanes).  The
        split puts lanes that fit a percentile-derived smaller shape in
        a second dispatch with tighter static dims; everything else
        keeps the global dims.  Results are identical either way (the
        kernel masks padding), pinned by test_fused_idx_bucket_split.
        The two calls are dispatched back-to-back before either result
        is fetched, so device execution overlaps dispatch."""
        from bwamem_tpu.pipeline.driver import _bucket as _bkt

        blk = self.blk_l
        q = getattr(fused_fn, "bp_quantum", blk)

        def one(scal_p, dims_p):
            return fused_fn(self._nib_reads(),
                            np.ascontiguousarray(scal_p),
                            self._fused_tmax2(scal_p, scal_p.shape[1]),
                            dims_p)

        if not self.bucket_split:
            return np.ascontiguousarray(np.asarray(one(scal, dims)),
                                        np.int32)
        valid = (scal[0] > 0) | (scal[5] > 0)
        dims2 = []
        for fq, ft in ((0, 1), (5, 6)):
            for row in (fq, ft):
                v = scal[row][valid & (scal[row] > 0)]
                p = int(np.percentile(v, 60)) if v.size else 1
                dims2.append(_bkt(max(p, 16), self._SPLIT_BUCKETS))
        dims2 = tuple(dims2)
        fit = valid & (scal[0] <= dims2[0]) & (scal[1] <= dims2[1]) \
            & (scal[5] <= dims2[2]) & (scal[6] <= dims2[3])
        nfit = int(fit.sum())
        # a tiny bucket is not worth a second tunnel round trip, and
        # identical dims mean the split would be two copies of one shape
        thr = self.split_min if self.split_min is not None \
            else max(q, Bp // 8)
        if (dims2 == dims or nfit < thr
                or (valid & ~fit).sum() == 0):
            return np.ascontiguousarray(np.asarray(one(scal, dims)),
                                        np.int32)
        idx_small = np.where(fit)[0]
        idx_big = np.where(~fit)[0]  # includes padding lanes (no-ops)

        def part(idx):
            m = len(idx)
            mp_ = _bkt(max(m, q), (512, 1024, 2048, 4096, 8192, 16384))
            if mp_ % q:
                mp_ = -(-mp_ // q) * q
            S = np.zeros((16, mp_), np.int32)
            S[:, :m] = scal[:, idx]
            return S, m

        Sb, nb = part(idx_big)
        Ss, ns = part(idx_small)
        rb = one(Sb, dims)       # dispatch both before fetching either
        rs = one(Ss, dims2)
        out = np.zeros((32, Bp), np.int32)
        out[:, idx_big] = np.asarray(rb)[:, :nb]
        out[:, idx_small] = np.asarray(rs)[:, :ns]
        return out

    def _extend(self, reads, raw_t_fn):
        import time

        t0 = time.time()
        self._chunk_start(reads)
        if self.tracer is not None:
            self.tracer.host(len(reads), time.time() - t0)
        if getattr(raw_t_fn, "fused", False):
            self._run_fused(raw_t_fn)
            return
        self._run_phase(raw_t_fn, "L")
        self.lib.mp_prepare_right(self.h)
        self._run_phase(raw_t_fn, "R")

    # -- single-end -------------------------------------------------------

    def align_chunk(self, reads, raw_t_fn, names=None, quals=None,
                    cigar_fn=None) -> list[list[SamRecord]]:
        """Full single-end alignment of a chunk; returns per-read SAM
        records identical to driver.align_batch.

        With ``cigar_fn`` (ops/global_jax.make_cigar_backend) the
        reg2aln banded-global realignments run ON DEVICE through the
        mp_cigar_* round protocol (band-doubling retries compacted
        across the chunk) instead of host C; output is byte-identical."""
        import time

        names = names or [f"read{i}" for i in range(len(reads))]
        quals = quals or [None] * len(reads)
        self._extend(reads, raw_t_fn)
        t_fin = time.time()
        if cigar_fn is not None:
            n_active = int(self.lib.mp_cigar_begin(self.h, self.nthreads))
            self._device_cigar_rounds(n_active, cigar_fn)
            nrec = self.lib.mp_finalize_records(self.h, self.nthreads)
        else:
            nrec = self.lib.mp_finalize(self.h, self.nthreads)
        out = self._collect(nrec, len(reads), reads, names, quals)
        self.lib.mp_chunk_end(self.h)
        if self.tracer is not None:
            self.tracer.host(0, time.time() - t_fin)
        return out

    def align_chunk_text(self, reads, raw_t_fn, names=None, quals=None,
                         cigar_fn=None) -> tuple[str, int]:
        """align_chunk's zero-object fast path: returns the chunk's SAM
        as ONE newline-terminated text blob (already in output order)
        plus the record count — no per-record Python at all.  Byte
        parity with align_chunk is pinned by test_native_pipe."""
        import time

        names = names or [f"read{i}" for i in range(len(reads))]
        quals = quals or [None] * len(reads)
        self._extend(reads, raw_t_fn)
        t_fin = time.time()
        if cigar_fn is not None:
            n_active = int(self.lib.mp_cigar_begin(self.h, self.nthreads))
            self._device_cigar_rounds(n_active, cigar_fn)
            nrec = self.lib.mp_finalize_records(self.h, self.nthreads)
        else:
            nrec = self.lib.mp_finalize(self.h, self.nthreads)
        text = ""
        if nrec:
            text, _, _ = self._emit_blob(nrec, names, quals,
                                         newline=True)
        self.lib.mp_chunk_end(self.h)
        if self.tracer is not None:
            self.tracer.host(0, time.time() - t_fin)
        return text, int(nrec)

    def _device_cigar_rounds(self, n_active, cigar_fn):
        """reg2aln band-doubling retry as compacted device rounds: the
        whole chunk's global fills + tracebacks per round in one jit
        call (align.py batched_global_results, here over the C++ task
        list)."""
        import time

        o = self.opt
        mq, mt = ctypes.c_int64(), ctypes.c_int64()
        rnd = 0
        while n_active:
            self.lib.mp_cigar_dims(self.h, ctypes.byref(mq),
                                   ctypes.byref(mt))
            lq = _bucket(max(int(mq.value), 1))
            lt = _bucket(max(int(mt.value), 1))
            Bp = _bucket(max(n_active, 256),
                         (256, 512, 1024, 2048, 4096, 8192, 16384))
            t0 = time.time()
            if getattr(cigar_fn, "idx", False):
                # resident-reference rounds: meta only, segments
                # gathered on device
                meta = np.zeros((8, Bp), np.int32)
                self.lib.mp_cigar_fill_idx(
                    self.h, meta.ctypes.data_as(_P32), Bp)
                scores, ncig, flat = cigar_fn(
                    self._nib_reads(), meta, o.mat, o.o_del, o.e_del,
                    o.o_ins, o.e_ins, lq, lt)
            else:
                q = np.zeros((Bp, lq), np.int8)
                t = np.zeros((Bp, lt), np.int8)
                meta = np.zeros((3, Bp), np.int32)
                self.lib.mp_cigar_fill(
                    self.h, q.ctypes.data_as(_PI8), lq,
                    t.ctypes.data_as(_PI8), lt,
                    meta.ctypes.data_as(_P32), Bp)
                scores, ncig, flat = cigar_fn(q, t, meta, o.mat,
                                              o.o_del, o.e_del,
                                              o.o_ins, o.e_ins)
            scores = np.ascontiguousarray(scores, np.int32)
            ncig = np.ascontiguousarray(ncig, np.int32)
            flat = np.ascontiguousarray(flat, np.int32)
            if self.tracer is not None:
                self.tracer.batch(
                    f"cigar_r{rnd}", n_active,
                    int(meta[0].astype(np.int64) @
                        meta[1].astype(np.int64)),
                    time.time() - t0, Bp=Bp, qmax=lq, tmax=lt)
            n_active = int(self.lib.mp_cigar_apply(
                self.h, scores.ctypes.data_as(_P32),
                ncig.ctypes.data_as(_P32),
                flat.ctypes.data_as(_P32), Bp))
            rnd += 1

    def align_pairs_chunk(self, reads1, reads2, raw_t_fn, names=None,
                          quals1=None, quals2=None, rescue_fn=None,
                          cigar_fn=None) -> list[list[SamRecord]]:
        """Full paired-end alignment of a chunk in C++ (mem_sam_pe):
        insert-size inference over the chunk, mate rescue, pairing,
        record emission — identical output to pair.align_pairs.

        With ``rescue_fn`` (ops/local_jax.make_rescue_backend) the
        mem_matesw local-SW batches run ON DEVICE through the
        mp_rescue_* wave protocol instead of host C; output is
        byte-identical (pairs are independent within a wave).  With
        ``cigar_fn`` (ops/global_jax.make_cigar_backend) the sam_pe
        reg2aln banded globals run as device rounds over the superset
        of candidate regions (selection happens later, inside
        sam_pe)."""
        import time

        n = len(reads1)
        names = names or [f"pair{i}" for i in range(n)]
        quals1 = quals1 or [None] * n
        quals2 = quals2 or [None] * n
        reads = list(reads1) + list(reads2)
        all_names = names + names
        all_quals = list(quals1) + list(quals2)
        self._extend(reads, raw_t_fn)
        t_fin = time.time()
        device_rescue = rescue_fn is not None and self.opt.max_matesw > 0
        if device_rescue or cigar_fn is not None:
            self.lib.mp_pe_prepare(self.h, n, self.nthreads)
            if device_rescue:
                self._device_rescue(rescue_fn)
            else:
                self.lib.mp_rescue_host(self.h, n, self.nthreads)
            if cigar_fn is not None:
                n_active = int(self.lib.mp_cigar_collect_pe(self.h))
                self._device_cigar_rounds(n_active, cigar_fn)
            nrec = self.lib.mp_finalize_pe_tail(self.h, n, self.nthreads)
        else:
            nrec = self.lib.mp_finalize_pe(self.h, n, self.nthreads)
        out = self._collect(nrec, n, reads, all_names, all_quals)
        self.lib.mp_chunk_end(self.h)
        if self.tracer is not None:
            self.tracer.host(0, time.time() - t_fin)
        return out

    def align_pairs_chunk_text(self, reads1, reads2, raw_t_fn,
                               names=None, quals1=None, quals2=None,
                               rescue_fn=None,
                               cigar_fn=None) -> tuple[str, int]:
        """align_pairs_chunk's zero-object fast path (see
        align_chunk_text)."""
        import time

        n = len(reads1)
        names = names or [f"pair{i}" for i in range(n)]
        quals1 = quals1 or [None] * n
        quals2 = quals2 or [None] * n
        reads = list(reads1) + list(reads2)
        all_names = names + names
        all_quals = list(quals1) + list(quals2)
        self._extend(reads, raw_t_fn)
        t_fin = time.time()
        device_rescue = rescue_fn is not None and self.opt.max_matesw > 0
        if device_rescue or cigar_fn is not None:
            self.lib.mp_pe_prepare(self.h, n, self.nthreads)
            if device_rescue:
                self._device_rescue(rescue_fn)
            else:
                self.lib.mp_rescue_host(self.h, n, self.nthreads)
            if cigar_fn is not None:
                n_active = int(self.lib.mp_cigar_collect_pe(self.h))
                self._device_cigar_rounds(n_active, cigar_fn)
            nrec = self.lib.mp_finalize_pe_tail(self.h, n, self.nthreads)
        else:
            nrec = self.lib.mp_finalize_pe(self.h, n, self.nthreads)
        text = ""
        if nrec:
            text, _, _ = self._emit_blob(nrec, all_names, all_quals,
                                         newline=True)
        self.lib.mp_chunk_end(self.h)
        if self.tracer is not None:
            self.tracer.host(0, time.time() - t_fin)
        return text, int(nrec)

    def _device_rescue(self, rescue_fn):
        """mem_matesw wave loop: wave k ships the k-th-anchor rescue
        windows of BOTH ends of every pair as ONE padded device batch.
        bwa's sequential-anchor semantics survive because (a) the skip
        test for anchor k runs in C++ against the regions waves 0..k-1
        appended, and (b) the two ends' chains touch disjoint region
        lists (end-0 anchors test/append the end-1 list and vice
        versa), exactly as under bwa's up-front b[0]/b[1] snapshot —
        so fusing the ends halves the tunnel round trips per chunk."""
        import time

        o = self.opt
        mq, mt = ctypes.c_int64(), ctypes.c_int64()
        waves = int(self.lib.mp_rescue_begin(self.h))
        for k in range(waves):
            ntask = int(self.lib.mp_rescue_wave_build(
                self.h, k, ctypes.byref(mq), ctypes.byref(mt)))
            if ntask == 0:
                continue
            lq = _bucket(max(int(mq.value), 1))
            lt = _bucket(max(int(mt.value), 1),
                         (512, 1024, 2048, 4096, 8192, 16384))
            Bp = _bucket(max(ntask, 256),
                         (256, 512, 1024, 2048, 4096, 8192, 16384))
            t0 = time.time()
            if getattr(rescue_fn, "idx", False):
                # resident-reference waves: meta only, windows
                # gathered on device
                meta = np.zeros((6, Bp), np.int32)
                self.lib.mp_rescue_fill_idx(
                    self.h, meta.ctypes.data_as(_P32), Bp)
                lens = meta[:2]
                out = np.ascontiguousarray(rescue_fn(
                    self._nib_reads(), meta, self.opt.mat, o.o_del,
                    o.e_del, o.o_ins, o.e_ins, lq, lt), np.int32)
            else:
                seq = np.zeros((Bp, lq), np.int8)
                rseq = np.zeros((Bp, lt), np.int8)
                lens = np.zeros((2, Bp), np.int32)
                self.lib.mp_rescue_fill(
                    self.h, seq.ctypes.data_as(_PI8), lq,
                    rseq.ctypes.data_as(_PI8), lt,
                    lens.ctypes.data_as(_P32), Bp)
                out = np.ascontiguousarray(np.asarray(rescue_fn(
                    seq, rseq, lens, self.opt.mat, o.o_del, o.e_del,
                    o.o_ins, o.e_ins)), np.int32)
            if self.tracer is not None:
                self.tracer.batch(
                    f"rescue_w{k}", ntask,
                    int(lens[0].astype(np.int64) @
                        lens[1].astype(np.int64)),
                    time.time() - t0, Bp=Bp, qmax=lq, tmax=lt)
            self.lib.mp_rescue_apply(
                self.h, out.ctypes.data_as(_P32), Bp)

    def _emit_blob(self, nrec, names, quals, newline=False):
        """Render the chunk's records as one SAM text blob in C++
        (mp_emit_sam, -t threads), in final output order (records are
        flattened read-by-read / pair-by-pair).  Returns (text, line
        offsets, record->group map); `newline=True` terminates every
        line so the blob streams directly."""
        name_off = np.zeros(len(names) + 1, np.int64)
        np.cumsum([len(s) for s in names], out=name_off[1:])
        name_blob = "".join(names).encode("ascii")
        qual_blob = None
        qual_off_p = None
        if any(quals):
            qual_off = np.zeros(len(quals) + 1, np.int64)
            np.cumsum([len(q) if q else 0 for q in quals],
                      out=qual_off[1:])
            qual_blob = "".join(q or "" for q in quals).encode("ascii")
            qual_off_p = qual_off.ctypes.data_as(_P64)
        cap = int(self.lib.mp_sam_size(
            self.h, name_off.ctypes.data_as(_P64))) + nrec
        buf = ctypes.create_string_buffer(max(cap, 1))
        line_off = np.zeros(nrec + 1, np.int64)
        group = np.zeros(nrec, np.int64)
        self.lib.mp_emit_sam(
            self.h, name_blob, name_off.ctypes.data_as(_P64), qual_blob,
            qual_off_p, buf, line_off.ctypes.data_as(_P64),
            group.ctypes.data_as(_P64), self.nthreads,
            1 if newline else 0)
        text = buf.raw[:int(line_off[nrec])].decode("ascii")
        return text, line_off, group

    def _collect(self, nrec, n_groups, reads, names, quals):
        """SAM lines for the chunk, grouped by read (SE) / pair (PE).

        The whole aln2sam assembly (seq/qual orientation, hard clips,
        tags) runs in C++; Python only slices the returned text blob —
        one SamLine object per record is the entire per-record Python
        cost (align_chunk_text skips even that)."""
        del reads
        out: list[list] = [[] for _ in range(n_groups)]
        if nrec == 0:
            return out
        text, line_off, group = self._emit_blob(nrec, names, quals)
        off = line_off.tolist()
        for i, g in enumerate(group.tolist()):
            out[g].append(SamLine(text[off[i]:off[i + 1]]))
        return out

    # -- paired-end support: regions only --------------------------------

    def regions_chunk(self, reads, raw_t_fn) -> list[list[Region]]:
        """Extension + replay, exporting deduped score-sorted regions
        (compute_regions equivalent) for the Python PE machinery."""
        self._extend(reads, raw_t_fn)
        n = self.lib.mp_region_count(self.h, self.nthreads)
        rows = np.zeros((max(n, 1), 10), np.int64)
        self.lib.mp_export_regions(self.h, rows.ctypes.data_as(_P64))
        out: list[list[Region]] = [[] for _ in reads]
        for i in range(n):
            (ri, rb, re, qb, qe, score, truesc, w, seedcov,
             seedlen0) = (int(x) for x in rows[i])
            out[ri].append(Region(rb=rb, re=re, qb=qb, qe=qe, score=score,
                                  truesc=truesc, w=w, seedcov=seedcov,
                                  seedlen0=seedlen0))
        self.lib.mp_chunk_end(self.h)
        return out


def make_raw_t_backend(params, blk_l: int = 512, interpret: bool = False):
    """Jitted transposed-layout Pallas backend for NativePipeline
    (the production device path; `interpret=True` for CPU testing).

    The scoring parameters travel as a jit ARGUMENT (the kernel's
    scalar-prefetch block), so one compiled program serves every
    MemOptions — changing -A/-B/-O/-E/zdrop costs zero recompiles
    (the reference's per-batch header words 0-1)."""
    import jax

    from bwamem_tpu.ops.extend_pallas import (
        extend_batch_raw_t,
        params_vector,
    )

    import jax.numpy as jnp

    prm = params_vector(params)

    # inputs arrive int8 (4x smaller transfer); convert on-device
    fn = jax.jit(lambda q, t, s, tm, p: extend_batch_raw_t(
        q.astype(jnp.int32), t.astype(jnp.int32), s, tm, prm=p,
        blk_l=blk_l, interpret=interpret))

    def raw_t(query_t, target_t, scal_t, tmaxb, prm_override=None):
        return fn(query_t, target_t, scal_t, tmaxb,
                  prm if prm_override is None else prm_override)

    return raw_t


def make_fused_backend(params, blk_l: int = 512, interpret: bool = False):
    """Jitted fused whole-alignment backend (one device round trip per
    chunk — ops/extend_pallas._extend_kernel_fused).  Scoring params
    remain a jit argument: zero recompiles across MemOptions."""
    import jax
    import jax.numpy as jnp

    from bwamem_tpu.ops.extend_pallas import (
        extend_batch_raw_fused,
        params_vector,
    )

    prm = params_vector(params)

    fn = jax.jit(lambda ql, tl, qr, tr, s, tm, p: extend_batch_raw_fused(
        ql.astype(jnp.int32), tl.astype(jnp.int32),
        qr.astype(jnp.int32), tr.astype(jnp.int32), s, tm, p,
        blk_l=blk_l, interpret=interpret))

    def fused(ql, tl, qr, tr, scal_t, tmax2, prm_override=None):
        return fn(ql, tl, qr, tr, scal_t, tmax2,
                  prm if prm_override is None else prm_override)

    fused.fused = True
    fused.bp_quantum = blk_l
    return fused


def two_strand_text(pac: np.ndarray) -> np.ndarray:
    """The device-resident two-strand reference text T2 (int8 codes):
    T2[p] = pac[p] for p < l_pac, else the strand fold of
    pac[2*l_pac-1-p] — exactly csrc get_seq(), so every chain window
    rseq[ci] == T2[rmax0:rmax1]."""
    fwd = np.ascontiguousarray(pac, np.int8)
    rev = fwd[::-1]
    fold = np.where(rev < 4, 3 - rev, rev).astype(np.int8)
    return np.concatenate([fwd, fold])


def two_strand_text_packed(pac: np.ndarray) -> np.ndarray:
    """The wide-reference layout: the two-strand text nibble-packed
    into flat uint32 words, 8 base codes per word, code k of word w at
    bits [4k+3:4k] (position p lives at word p>>3, nibble p&7; tail
    padded with N=4).

    Rationale: positions beyond 2^31 don't fit an int32 gather index
    into an int8 text, but p>>3 fits int32 for any p < 2^34 — covering
    GRCh38 two-strand (6.2e9 symbols) with ONE flat 1D gather plus a
    shift/mask, where round 2's (rows, 2^20) layout paid a 2-D gather
    per window element (measured 4x end-to-end, bench/README round-2c
    ladder note 3).  Packing also halves the HBM footprint (4 bits vs
    8 per symbol — the reference's own payload density, task_parse.v
    4-bit symbol stream)."""
    t2 = two_strand_text(pac)
    n = t2.shape[0]
    n_words = -(-n // 8)
    out = np.empty(n_words, np.uint32)
    # chunked so the shifted uint32 temporaries stay ~256 MB even at
    # GRCh38 scale (a single-shot pack would transiently need 4 bytes
    # per symbol, ~25 GB)
    step = 1 << 26  # words per chunk
    shifts = (np.arange(8, dtype=np.uint32) * 4)[None, :]
    for w0 in range(0, n_words, step):
        w1 = min(w0 + step, n_words)
        lo, hi = w0 * 8, w1 * 8
        blk = t2[lo:min(hi, n)].astype(np.uint32)
        if hi > n:  # pad the final partial word with N
            blk = np.concatenate(
                [blk, np.full(hi - n, 4, np.uint32)])
        out[w0:w1] = np.bitwise_or.reduce(
            blk.reshape(-1, 8) << shifts, axis=1)
    return out


def resident_text_host(pac) -> np.ndarray:
    """Host-side resident-text array: the nibble-packed uint32 layout
    for EVERY reference size.  Packing was introduced for >=2^31-symbol
    references (int32 word index covers 2^34 positions), but the
    word-aligned window gather (_text_gather_window) measured 2.7x
    faster than even the flat-int8 per-symbol gather (7.3 vs 19.8 ms
    per (320, 4096) window block on v5e), so the flat layout lost its
    only advantage; one layout serves all sizes."""
    return two_strand_text_packed(pac)


def make_resident_text(pac):
    """device_put the two-strand text once; share the returned array
    across the fused/rescue/cigar resident-reference backends so the
    reference lives in HBM exactly once."""
    import jax

    return jax.device_put(resident_text_host(pac))


def _nib_gather(reads_nib, row, col):
    """Gather base codes from the nibble-packed read matrix: element
    (row, col) of the logical (n, 2*L2) read matrix."""
    import jax.numpy as jnp

    L2 = reads_nib.shape[1]
    col = jnp.clip(col, 0, 2 * L2 - 1)
    b = jnp.take(reads_nib.reshape(-1), row * L2 + (col >> 1), axis=0)
    b = b.astype(jnp.int32) & 0xFF
    return jnp.where((col & 1) == 1, b >> 4, b & 0xF)


def _text_gather(text, lo, hi):
    """Per-symbol gather from the packed resident text at position
    hi*2^20 + lo (lo may have absorbed an offset of either sign;
    arithmetic >> floors, & takes the positive residue).

    Since hi*2^20 has zero low bits, pos>>3 = hi*2^17 + (lo>>3) and
    pos&7 = lo&7 — all int32 for any position < 2^34, so GRCh38-scale
    references pay exactly one flat gather plus a shift/mask.  The
    production paths use _text_gather_window (word-aligned, 2.7x
    faster); this per-symbol form is its semantic oracle
    (tests/test_native_pipe.py window-gather fuzz)."""
    import jax.numpy as jnp

    w = jnp.clip(hi * (1 << 17) + (lo >> 3), 0, text.shape[0] - 1)
    word = jnp.take(text, w, axis=0)
    return ((word >> ((lo & 7).astype(jnp.uint32) * 4)) & 0xF
            ).astype(jnp.int32)


def _text_gather_window(text, lo, hi, length, sign):
    """Gather `length` CONSECUTIVE base codes per lane from the packed
    resident text, starting at position hi*2^20 + lo and walking
    ascending (sign=+1) or descending (sign=-1).  Returns (length, B)
    int32.

    Consecutiveness is the whole trick: instead of one gather per
    symbol, gather length/8 + 1 uint32 words per lane, realign each
    lane's nibble stream by its start offset (two vector shifts + or),
    then extract symbols with STATIC row indexing — measured 2.7x
    faster than per-symbol gathers at the production window shape
    (bench_out_r3 gather probe)."""
    import jax.numpy as jnp

    if sign < 0:
        # descending window = ascending window from lo-(length-1),
        # flipped along the symbol axis
        lo = lo - (length - 1)
    nw = length // 8 + 1
    k = jnp.arange(nw, dtype=jnp.int32)[:, None]
    base = hi * (1 << 17) + (lo >> 3)
    W = jnp.take(text, jnp.clip(base[None, :] + k, 0, text.shape[0] - 1),
                 axis=0)                                   # (nw, B)
    off = ((lo & 7).astype(jnp.uint32) * 4)[None, :]
    Wn = jnp.concatenate([W[1:], W[-1:]], axis=0)
    # off==0 guard: x << 32 is undefined on uint32 lanes
    v = jnp.where(off == 0, W, (W >> off) | (Wn << (32 - off)))
    j = jnp.arange(length, dtype=jnp.int32)
    rows = v[j >> 3]              # static row select along sublanes
    out = ((rows >> ((j & 7)[:, None].astype(jnp.uint32) * 4)) & 0xF
           ).astype(jnp.int32)
    return out[::-1] if sign < 0 else out


def fused_idx_local(reads_nib, scal, tmax2, prm, text, *, qmax_l,
                    tmax_l, qmax_r, tmax_r, blk_l, interpret, a_max):
    """Traceable body of the resident-reference fused step: gather the
    query windows from the nibble-packed read matrix and the target
    windows from the two-strand text, then run the fused kernel.
    Shared by the single-chip backend and the mesh-sharded one (where
    text/reads replicate and the lane axis shards).

    Target starts arrive as (lo20, hi) int32 pairs (scal rows 12-15).
    `text` is the flat nibble-packed uint32 two-strand text
    (two_strand_text_packed) — word-aligned window gathers cover any
    reference to 2^34 positions (GRCh38 two-strand included) with int32
    indices."""
    import jax.numpy as jnp

    from bwamem_tpu.ops.extend_pallas import extend_batch_raw_fused

    L2 = reads_nib.shape[1]
    ri = scal[10][None, :]

    def q_gather(qmax, col_of):
        j = jnp.arange(qmax, dtype=jnp.int32)[:, None]
        return _nib_gather(reads_nib, ri, col_of(j))

    def t_gather(tmax, lo_row, hi_row, sign):
        return _text_gather_window(text, scal[lo_row], scal[hi_row],
                                   tmax, sign)

    # left query = reversed read prefix; right = read suffix
    ql = q_gather(qmax_l, lambda j: scal[0][None, :] - 1 - j)
    qr = q_gather(qmax_r, lambda j: scal[11][None, :] + j)
    # left target descends from rows 12/14; right ascends from 13/15
    tl = t_gather(tmax_l, 12, 14, -1)
    tr = t_gather(tmax_r, 13, 15, +1)
    out = extend_batch_raw_fused(ql, tl, qr, tr, scal, tmax2, prm,
                                 blk_l=blk_l, interpret=interpret)
    # result fields fit int16 whenever the score bound a*l_query does
    # (tlen is hardware-capped at 2047): half the D2H.  The gate is
    # static at trace time, so exotic scoring keeps the int32 path.
    if a_max * 2 * L2 < 32000:
        out = out.astype(jnp.int16)
    return out


def make_fused_idx_backend(params, pac, blk_l: int = 512,
                           interpret: bool = False, text_dev=None):
    """Fused backend with a DEVICE-RESIDENT reference: the host ships
    only per-lane scalars + the chunk's read matrix; query/target
    windows are gathered on device from the resident two-strand text.

    Rationale: the host↔device tunnel is the single-chip pipeline
    bottleneck (measured ~30-50 MB/s H2D); the padded base payload of
    mp_fill_fused is ~4 MB per 2048-read chunk vs ~0.6 MB of scalars +
    reads here.  This is the TPU-native version of the reference's
    4-bit payload packing (task_parse.v payload stream) taken to its
    conclusion: the reference DMA-fetches every batch over QPI
    (tbb.v line fetches); a TPU can instead keep the whole reference
    in HBM and fetch nothing.

    The text is the nibble-packed uint32 layout (two_strand_text_packed)
    at every size — one word-aligned window gather per target, int32
    indices to 2^34 positions (GRCh38 two-strand included)."""
    import functools

    import jax

    from bwamem_tpu.ops.extend_pallas import params_vector

    prm = params_vector(params)
    a_max = int(np.max(np.asarray(params.mat_flat)))
    text = (text_dev if text_dev is not None
            else make_resident_text(pac))

    @functools.partial(
        jax.jit, static_argnames=("qmax_l", "tmax_l", "qmax_r", "tmax_r"))
    def fn(reads_nib, scal, tmax2, p, text, *, qmax_l, tmax_l, qmax_r,
           tmax_r):
        # reads arrive nibble-packed (two base codes per byte, low
        # nibble first) — half the H2D bytes of the dominant transfer
        return fused_idx_local(reads_nib, scal, tmax2, p, text,
                               qmax_l=qmax_l, tmax_l=tmax_l,
                               qmax_r=qmax_r, tmax_r=tmax_r,
                               blk_l=blk_l, interpret=interpret,
                               a_max=a_max)

    def fused_idx(reads_mat, scal, tmax2, dims, prm_override=None):
        qmax_l, tmax_l, qmax_r, tmax_r = dims
        return fn(reads_mat, scal, tmax2,
                  prm if prm_override is None else prm_override, text,
                  qmax_l=qmax_l, tmax_l=tmax_l, qmax_r=qmax_r,
                  tmax_r=tmax_r)

    fused_idx.fused = True
    fused_idx.idx = True
    fused_idx.bp_quantum = blk_l
    return fused_idx


def rescue_idx_local(reads_nib, meta, mat, pens, text, *, qmax, tmax):
    """Traceable body of the resident-reference mate-rescue wave:
    gather the mate sequence from the read matrix (revcomp'd in-lane
    when meta row 3 is set) and the reference window from the text,
    then run the batched local SW (ops/local_jax._align6).  meta rows:
    [l_ms, l_ts, read index, is_rev, win_lo20, win_hi]."""
    import jax.numpy as jnp

    from bwamem_tpu.ops.local_jax import _align6

    j = jnp.arange(qmax, dtype=jnp.int32)[None, :]
    rev = meta[3][:, None]
    col = jnp.where(rev == 1, meta[0][:, None] - 1 - j, j)
    q = _nib_gather(reads_nib, meta[2][:, None], col)
    q = jnp.where((rev == 1) & (q < 4), 3 - q, q)
    t = _text_gather_window(text, meta[4], meta[5], tmax, 1).T
    return _align6(q, meta[0], t, meta[1], mat, pens, qmax=qmax,
                   tmax=tmax)


def make_rescue_idx_backend(pac=None, text_dev=None):
    """Resident-reference device mate rescue: NativePipeline's
    mp_rescue_* wave protocol ships only the (6, Bp) meta block — the
    mate sequences and reference windows are gathered on device (the
    windows are up to pestat-high + read-length wide, ~0.5-1.5 MB of
    payload per wave otherwise).  Pass `text_dev` to share the text
    array with the fused backend."""
    import functools

    import jax
    import jax.numpy as jnp

    text = text_dev if text_dev is not None else make_resident_text(pac)

    @functools.partial(jax.jit, static_argnames=("qmax", "tmax"))
    def fn(reads_nib, meta, mat, pens, text, *, qmax, tmax):
        return rescue_idx_local(reads_nib, meta, mat, pens, text,
                                qmax=qmax, tmax=tmax)

    def rescue_idx(reads_nib, meta, mat, o_del, e_del, o_ins, e_ins,
                   qmax, tmax):
        pens = jnp.asarray(
            np.array([o_del, e_del, o_ins, e_ins], np.int32))
        out = fn(reads_nib, meta, jnp.asarray(np.asarray(mat, np.int32)),
                 pens, text, qmax=qmax, tmax=tmax)
        return np.asarray(out, np.int32)

    rescue_idx.idx = True
    return rescue_idx


def cigar_idx_local(reads_nib, meta, mat, pens, text, *, qmax, tmax):
    """Traceable body of the resident-reference CIGAR round: gather
    the query segment from the read matrix and the reference segment
    from the text (both walked backwards for reverse-strand regions,
    matching gen_cigar_setup), then run the batched banded global
    alignment + traceback (ops/global_jax._global_batch).  meta rows:
    [qlen, tlen, w, read index, qcol0, is_rev, t_lo20, t_hi]."""
    import jax.numpy as jnp

    from bwamem_tpu.ops.global_jax import _global_batch

    sign = jnp.where(meta[5] == 1, -1, 1)[:, None]
    j = jnp.arange(qmax, dtype=jnp.int32)[None, :]
    q = _nib_gather(reads_nib, meta[3][:, None],
                    meta[4][:, None] + sign * j)
    # per-lane walk direction: one ascending window gather (reverse
    # lanes start at t_lo - (tmax-1)), then a static flip selected per
    # lane — still the word-aligned fast path
    rev = meta[5] == 1
    lo = jnp.where(rev, meta[6] - (tmax - 1), meta[6])
    A = _text_gather_window(text, lo, meta[7], tmax, 1)   # (tmax, B)
    t = jnp.where(rev[None, :], A[::-1], A).T
    return _global_batch(q, meta[0], t, meta[1], meta[2], mat, pens,
                         qmax=qmax, tmax=tmax)


def make_cigar_idx_backend(pac=None, text_dev=None):
    """Resident-reference device CIGAR: NativePipeline's mp_cigar_*
    round protocol ships only the (8, Bp) meta block; query/reference
    segments are gathered on device.  Pass `text_dev` to share the
    text array with the fused/rescue backends."""
    import functools

    import jax
    import jax.numpy as jnp

    from bwamem_tpu.ops.global_jax import pack_cigar_round

    text = text_dev if text_dev is not None else make_resident_text(pac)

    @functools.partial(jax.jit, static_argnames=("qmax", "tmax"))
    def fn(reads_nib, meta, mat, pens, text, *, qmax, tmax):
        return cigar_idx_local(reads_nib, meta, mat, pens, text,
                               qmax=qmax, tmax=tmax)

    def cigar_idx(reads_nib, meta, mat, o_del, e_del, o_ins, e_ins,
                  qmax, tmax):
        pens = jnp.asarray(
            np.array([o_del, e_del, o_ins, e_ins], np.int32))
        score, steps = fn(reads_nib, meta,
                          jnp.asarray(np.asarray(mat, np.int32)), pens,
                          text, qmax=qmax, tmax=tmax)
        return pack_cigar_round(score, steps)

    cigar_idx.idx = True
    return cigar_idx


def make_jax_raw_t_backend(params):
    """raw_t adapter over the extend_jax twin (CPU-testable oracle)."""
    import jax
    import jax.numpy as jnp

    from bwamem_tpu.ops.extend_jax import extend_batch_core

    core = jax.jit(lambda *a: extend_batch_core(*a, params))

    def fn(query_t, target_t, scal_t, tmaxb):
        out = core(jnp.asarray(query_t.T, jnp.int32),
                   jnp.asarray(scal_t[0]),
                   jnp.asarray(target_t.T, jnp.int32),
                   jnp.asarray(scal_t[1]),
                   jnp.asarray(scal_t[2]), jnp.asarray(scal_t[3]))
        z = np.zeros(query_t.shape[1], np.int32)
        return np.stack([
            np.asarray(out.score), np.asarray(out.qle),
            np.asarray(out.tle), np.asarray(out.gtle),
            np.asarray(out.gscore), np.asarray(out.max_off),
            np.asarray(out.w_used), z])

    return fn
