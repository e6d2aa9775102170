"""Device-side seeding parity (ops/smem_jax SA walks + seed rows).

Three pins, increasingly end-to-end:
1. the jitted batched bwt_sa equals the host occ_packed.sa_value_batch;
2. collect_seeds_device emits seed rows byte-identical (values AND
   order) to the native C++ engine (csrc/smem.cpp bwamem_collect_seeds);
3. NativePipeline with seed_fn (mp_chunk_start_seeded) produces SAM
   byte-identical to the host-seeded pipeline.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bwamem_tpu.config import MemOptions
from bwamem_tpu.index.build import build_index
from bwamem_tpu.index.occ_packed import pack_occ, sa_value_batch
from bwamem_tpu.io.fasta import Contig, Reference
from bwamem_tpu.ops.smem_jax import (
    DeviceOcc,
    collect_seeds_device,
    make_device_seeder,
    make_sa_batch_device,
)
from bwamem_tpu.pipeline import native_driver
from bwamem_tpu.pipeline.align import revcomp_read


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(1234)
    pac = rng.integers(0, 4, 60000).astype(np.uint8)
    pac[40000:40900] = pac[1000:1900]  # repeat region: s > 1 intervals
    ref = Reference(contigs=[Contig("chr1", 0, 60000)], pac=pac)
    fm = build_index(pac)
    po = pack_occ(fm)
    return ref, fm, po, rng


def make_reads(rng, fm, n, L=100):
    reads = []
    for i in range(n):
        pos = int(rng.integers(0, fm.l_pac - L - 5))
        r = fm.pac[pos:pos + L].astype(np.int64).copy()
        for _ in range(int(rng.integers(0, 5))):
            r[int(rng.integers(0, L))] = int(rng.integers(0, 5))
        if rng.random() < 0.4:
            r = revcomp_read(r)
        reads.append(r)
    return reads


@pytest.mark.parametrize("seed", range(3))
def test_sa_batch_device_matches_host(world, seed):
    _ref, fm, po, _rng = world
    rng = np.random.default_rng(900 + seed)
    rows = rng.integers(0, po.n_rows, 512).astype(np.int64)
    want = sa_value_batch(po, fm.ssa, fm.sa_intv, rows)
    sa_fn = make_sa_batch_device(DeviceOcc(po), fm.ssa, fm.sa_intv)
    got = np.asarray(sa_fn(jnp.asarray(rows.astype(np.int32))))
    np.testing.assert_array_equal(got.astype(np.int64), want)


@pytest.mark.skipif(not native_driver.available(),
                    reason="native library unavailable")
@pytest.mark.parametrize("seed", range(2))
def test_collect_seeds_device_matches_native(world, seed):
    from bwamem_tpu import native

    _ref, fm, po, _rng = world
    rng = np.random.default_rng(40 + seed)
    reads = make_reads(rng, fm, 24)
    opt = MemOptions()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    L = max(len(r) for r in reads)
    mat = np.full((len(reads), L), 4, np.uint8)
    qlen = np.zeros(len(reads), np.int64)
    for i, r in enumerate(reads):
        mat[i, :len(r)] = r
        qlen[i] = len(r)
    n, want = native.collect_seeds_native(
        po, fm.ssa, fm.sa_intv, mat, qlen, opt.min_seed_len, split_len,
        opt.split_width, opt.max_occ)
    got = collect_seeds_device(DeviceOcc(po), fm, reads,
                               opt.min_seed_len, split_len,
                               opt.split_width, opt.max_occ)
    np.testing.assert_array_equal(got, want[:n])


@pytest.mark.skipif(not native_driver.available(),
                    reason="native library unavailable")
def test_native_pipeline_device_seeded_sam_parity(world):
    """mp_chunk_start_seeded fed by the device seeder == the default
    host-seeded pipeline, byte for byte, SE text path."""
    from tests.test_native_pipe import _backends

    ref, fm, po, _rng = world
    rng = np.random.default_rng(77)
    reads = make_reads(rng, fm, 30)
    names = [f"r{i}" for i in range(len(reads))]
    quals = ["I" * len(r) for r in reads]
    opt = MemOptions()
    _row_fn, raw_t_fn = _backends(opt)
    host_pipe = native_driver.NativePipeline(opt, ref, fm, po)
    want, nw = host_pipe.align_chunk_text(reads, raw_t_fn, names=names,
                                          quals=quals)
    dev_pipe = native_driver.NativePipeline(opt, ref, fm, po)
    dev_pipe.seed_fn = make_device_seeder(po, fm, opt)
    got, ng = dev_pipe.align_chunk_text(reads, raw_t_fn, names=names,
                                        quals=quals)
    assert nw == ng
    assert want == got


@pytest.mark.skipif(not native_driver.available(),
                    reason="native library unavailable")
def test_device_seeded_degenerate_reads(world):
    """All-N, tiny, and unmappable-junk reads through the device-seeded
    pipeline: no crash, SAM identical to host seeding (these exercise
    the zero-seed and partial-seed rows paths of
    mp_chunk_start_seeded)."""
    from tests.test_native_pipe import _backends

    ref, fm, po, _rng = world
    rng = np.random.default_rng(99)
    mid_n = fm.pac[800:950].astype(np.int64).copy()
    mid_n[40:70] = 4  # interior N run (exercises the next-non-N jump)
    tail_n = fm.pac[200:350].astype(np.int64).copy()
    tail_n[120:] = 4  # N run through the read end
    reads = [
        np.full(80, 4, np.int64),                      # all N
        np.array([0, 1, 2, 3], np.int64),              # shorter than -k
        rng.integers(0, 4, 120).astype(np.int64),      # random junk
        fm.pac[500:650].astype(np.int64),              # mappable
        mid_n,
        tail_n,
    ]
    opt = MemOptions()
    _row_fn, raw_t_fn = _backends(opt)
    host_pipe = native_driver.NativePipeline(opt, ref, fm, po)
    want, nw = host_pipe.align_chunk_text(reads, raw_t_fn)
    dev_pipe = native_driver.NativePipeline(opt, ref, fm, po)
    dev_pipe.seed_fn = make_device_seeder(po, fm, opt)
    got, ng = dev_pipe.align_chunk_text(reads, raw_t_fn)
    assert (nw, want) == (ng, got)


@pytest.mark.skipif(not native_driver.available(),
                    reason="native library unavailable")
def test_native_pipeline_device_seeded_pe_parity(world):
    """PE chunk through mp_chunk_start_seeded == host-seeded PE."""
    from tests.test_native_pipe import _backends

    ref, fm, po, _rng = world
    rng = np.random.default_rng(78)
    r1s, r2s = [], []
    for _i in range(12):
        pos = int(rng.integers(0, ref.l_pac - 500))
        isize = 300 + int(rng.integers(-30, 30))
        r1s.append(ref.pac[pos:pos + 100].astype(np.int64))
        r2s.append(revcomp_read(
            ref.pac[pos + isize - 100:pos + isize].astype(np.int64)))
    opt = MemOptions()
    _row_fn, raw_t_fn = _backends(opt)
    host_pipe = native_driver.NativePipeline(opt, ref, fm, po)
    want, nw = host_pipe.align_pairs_chunk_text(r1s, r2s, raw_t_fn)
    dev_pipe = native_driver.NativePipeline(opt, ref, fm, po)
    dev_pipe.seed_fn = make_device_seeder(po, fm, opt)
    got, ng = dev_pipe.align_pairs_chunk_text(r1s, r2s, raw_t_fn)
    assert nw == ng
    assert want == got
