"""Metrics counters and checkpoint manifest."""

import numpy as np

from bwamem_tpu.utils.checkpoint import Manifest, ReadRange
from bwamem_tpu.utils.metrics import Counters, Tracer, band_cells


def test_band_cells():
    assert band_cells([100, 50], [200, 100], [100, 10]) == \
        200 * 100 + 100 * 21


def test_tracer_counters(tmp_path):
    tr = Tracer(str(tmp_path / "trace.jsonl"))
    tr.batch("extend_L", 512, 10_000_000, 0.005)
    tr.batch("extend_R", 512, 10_000_000, 0.005)
    assert tr.counters.device_batches == 2
    assert abs(tr.counters.gcups() - 2.0) < 1e-6
    tr.close()
    lines = (tmp_path / "trace.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2


def test_manifest_resume(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = Manifest(p)
    todo = m.pending(shard=0, n_reads=100, batch=40)
    assert [(r.start, r.end) for r in todo] == [(0, 40), (40, 80), (80, 100)]
    m.mark_done(todo[0])
    m.mark_done(todo[2])
    # a fresh process resumes exactly the missing range
    m2 = Manifest(p)
    left = m2.pending(0, 100, 40)
    assert [(r.start, r.end) for r in left] == [(40, 80)]


def test_native_fastq_scan_matches_python(tmp_path):
    from bwamem_tpu.io.fastq import parse_fastq, read_fastq

    fq = ("@r1 comment\nACGTN\n+\nIIIII\n"
          "@r2\nTTTT\n+\n!!!!\n"
          ">fa1\nACGT\nACGT\n"
          "@r3\nGG\n+\nII\n")
    p = tmp_path / "t.fq"
    p.write_text(fq)
    got = read_fastq(str(p))
    want = list(parse_fastq(fq))
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        assert g.name == w.name
        assert np.array_equal(g.seq, w.seq)
        assert g.qual == w.qual


def test_iter_fastq_chunks_streaming(tmp_path):
    """Chunked streaming ingest == whole-file parse, across block
    boundaries that split records."""
    from bwamem_tpu.io.fastq import iter_fastq_chunks, read_fastq

    rng = np.random.default_rng(3)
    recs = []
    for i in range(257):
        n = int(rng.integers(30, 90))
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, n))
        q = "".join(chr(33 + int(c)) for c in rng.integers(0, 40, n))
        recs.append(f"@read{i} c{i}\n{seq}\n+\n{q}\n")
    text = "".join(recs)
    p = tmp_path / "s.fq"
    p.write_text(text[:-1])  # no trailing newline: edge case
    want = read_fastq(str(p))
    # tiny blocks force many record-splitting boundaries
    got = [r for chunk in iter_fastq_chunks(str(p), 50, block_bytes=999)
           for r in chunk]
    assert len(got) == len(want) == 257
    for g, w in zip(got, want):
        assert g.name == w.name
        assert np.array_equal(g.seq, w.seq)
        assert g.qual == w.qual
    sizes = [len(c) for c in iter_fastq_chunks(str(p), 100,
                                               block_bytes=1 << 12)]
    assert sizes == [100, 100, 57]


def test_pack_tasks_soa():
    from bwamem_tpu.pipeline.tasks import pack_tasks

    qs = [np.array([0, 1, 2]), np.array([3] * 50), np.array([1, 2])]
    ts = [np.array([0, 1, 2, 3]), np.array([1] * 200), np.array([2])]
    b = pack_tasks(qs, ts, h0=[10, 20, 5], w=[100] * 3,
                   max_ins=[50] * 3, max_del=[50] * 3)
    assert b.query.shape[1] % 128 == 0
    assert b.size % 8 == 0
    assert b.n_real == 3
    assert list(b.qlen[:3]) == [3, 50, 2]
    # padding tasks are inert (qlen 0) and cells() counts band areas
    assert all(b.qlen[3:] == 0)
    assert b.cells() == 4 * 3 + 200 * 50 + 1 * 2
