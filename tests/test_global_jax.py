"""Device-side batched ksw_global (fill + traceback on device) must be
byte-identical to the scalar twin pipeline/cigar.ksw_global — score AND
CIGAR (ksw.c tie-breaking determines CIGAR identity with bwa)."""

import numpy as np
import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.ops.global_jax import ksw_global_batch
from bwamem_tpu.pipeline.cigar import ksw_global


def _mat(a, b):
    return MemOptions(a=a, b=b).mat


def _rand_task(rng, maxlen=60):
    qlen = int(rng.integers(1, maxlen))
    tlen = int(rng.integers(1, maxlen))
    if rng.random() < 0.6:
        # related pair: target = mutated/indel'd copy of query
        t = rng.integers(0, 4, qlen)
        q = t.copy()
        for _ in range(int(rng.integers(0, 5))):
            q[rng.integers(0, qlen)] = rng.integers(0, 4)
        tlen = qlen + int(rng.integers(-3, 4))
        tlen = max(tlen, 1)
        t = np.resize(t, tlen)
    else:
        q = rng.integers(0, 4, qlen)
        t = rng.integers(0, 4, tlen)
    if rng.random() < 0.2:
        q[rng.integers(0, len(q))] = 4            # N
    if rng.random() < 0.2:
        t[rng.integers(0, len(t))] = 4
    w = int(rng.integers(0, 16)) if rng.random() < 0.8 else 100
    return q.astype(np.int64), t.astype(np.int64), w


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    a, b = int(rng.integers(1, 4)), int(rng.integers(1, 6))
    o_del, e_del = int(rng.integers(1, 8)), int(rng.integers(1, 4))
    o_ins, e_ins = int(rng.integers(1, 8)), int(rng.integers(1, 4))
    mat = _mat(a, b)
    tasks = [_rand_task(rng) for _ in range(64)]
    got = ksw_global_batch(tasks, mat, o_del, e_del, o_ins, e_ins)
    for i, (q, t, w) in enumerate(tasks):
        want = ksw_global(q, t, mat, o_del, e_del, o_ins, e_ins, w,
                          use_native=False)
        assert got[i] == want, (i, q.tolist(), t.tolist(), w,
                                got[i], want)


def test_bwa_defaults_long_reads():
    """bwa -Ma defaults at read scale (150 bp) incl. empty-dim fast
    paths through the batch wrapper."""
    rng = np.random.default_rng(9)
    opt = MemOptions()
    tasks = []
    for _ in range(16):
        t = rng.integers(0, 4, 150)
        q = t.copy()
        for _ in range(6):
            q[rng.integers(0, 150)] = rng.integers(0, 4)
        # a simulated indel
        if rng.random() < 0.5:
            cut = int(rng.integers(20, 120))
            dl = int(rng.integers(1, 6))
            q = np.concatenate([q[:cut], q[cut + dl:]])
        tasks.append((q.astype(np.int64), t.astype(np.int64), 19))
    tasks.append((np.zeros(0, np.int64), np.array([1, 2]), 10))
    tasks.append((np.array([1, 2]), np.zeros(0, np.int64), 10))
    got = ksw_global_batch(tasks, opt.mat, opt.o_del, opt.e_del,
                           opt.o_ins, opt.e_ins)
    for i, (q, t, w) in enumerate(tasks):
        want = ksw_global(q, t, opt.mat, opt.o_del, opt.e_del,
                          opt.o_ins, opt.e_ins, w, use_native=False)
        assert got[i] == want, (i, got[i], want)


def test_device_cigar_sam_identical():
    """align_batch(device_cigar=True) — extension AND the reg2aln
    global traceback on device — must emit byte-identical SAM."""
    from bwamem_tpu.index.build import build_index
    from bwamem_tpu.io.fasta import Contig, Reference
    from bwamem_tpu.pipeline.align import revcomp_read
    from bwamem_tpu.pipeline.driver import align_batch
    from tests.test_driver import make_batch_fn

    rng = np.random.default_rng(41)
    opt = MemOptions()
    pac = rng.integers(0, 4, 40000).astype(np.uint8)
    ref = Reference(contigs=[Contig("chr1", 0, 40000)], pac=pac)
    fm = build_index(pac)
    reads, names = [], []
    for i in range(16):
        pos = int(rng.integers(0, 39800))
        read = pac[pos:pos + 120].astype(np.int64).copy()
        for _ in range(int(rng.integers(0, 5))):
            read[rng.integers(0, 120)] = rng.integers(0, 4)
        if i % 3 == 1:  # indel => real banded realignment, not fast path
            p = int(rng.integers(20, 100))
            if i % 2:
                read = np.concatenate([read[:p], rng.integers(0, 4, 3),
                                       read[p:]])[:120]
            else:
                read = np.concatenate([read[:p], read[p + 2:]])
        if i % 4 == 2:
            read = revcomp_read(read)
        reads.append(read)
        names.append(f"r{i}")
    fn = make_batch_fn(opt)
    host = [[r.line() for r in recs]
            for recs in align_batch(opt, ref, fm, reads, fn, names=names)]
    dev = [[r.line() for r in recs]
           for recs in align_batch(opt, ref, fm, reads, fn, names=names,
                                   device_cigar=True)]
    assert dev == host


def test_runtime_params_no_retrace():
    """Changing penalties/matrix must not retrace (traced args, not
    compile-time constants — task_parse.v:1954-1955 analogue)."""
    from bwamem_tpu.ops.global_jax import _global_batch

    rng = np.random.default_rng(3)
    tasks = [_rand_task(rng, 30) for _ in range(8)]
    n0 = _global_batch._cache_size()
    ksw_global_batch(tasks, _mat(1, 4), 6, 1, 6, 1)
    ksw_global_batch(tasks, _mat(2, 5), 5, 2, 7, 1)
    assert _global_batch._cache_size() - n0 <= 1
