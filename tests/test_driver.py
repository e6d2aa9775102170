"""Batched-device driver equivalence: align_batch (device-batched
extension) must produce byte-identical SAM to the scalar align_read."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from bwamem_tpu.config import MemOptions
from bwamem_tpu.index.build import build_index
from bwamem_tpu.io.fasta import Contig, Reference
from bwamem_tpu.ops.extend_jax import ExtendParams
from bwamem_tpu.ops import extend_jax
from bwamem_tpu.pipeline.align import align_read, revcomp_read
from bwamem_tpu.pipeline.driver import align_batch

OPT = MemOptions()


def make_batch_fn(opt):
    params = ExtendParams(
        mat_flat=jnp.asarray(opt.mat.astype(np.int32).ravel()), m=5,
        o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
        zdrop=opt.zdrop)

    def fn(query, qlen, target, tlen, aw, h0):
        return extend_jax.extend_batch_core(query, qlen, target, tlen,
                                            aw, h0, params)
    return fn


def test_batch_matches_scalar_sam():
    rng = np.random.default_rng(99)
    pac = rng.integers(0, 4, 40000).astype(np.uint8)
    ref = Reference(contigs=[Contig("chr1", 0, 40000)], pac=pac)
    fm = build_index(pac)

    reads, names = [], []
    for i in range(12):
        pos = int(rng.integers(0, 39800))
        read = pac[pos:pos + 100].astype(np.int64).copy()
        for _ in range(int(rng.integers(0, 4))):
            read[rng.integers(0, 100)] = rng.integers(0, 4)
        if i % 3 == 1:  # indel
            p = int(rng.integers(20, 80))
            if i % 2:
                read = np.concatenate([read[:p], rng.integers(0, 4, 3),
                                       read[p:]])[:100]
            else:
                read = np.concatenate([read[:p], read[p + 2:]])
        if i % 4 == 2:
            read = revcomp_read(read)
        reads.append(read)
        names.append(f"r{i}")

    scalar_sam = [
        [rec.line() for rec in align_read(OPT, ref, fm, n, r)]
        for n, r in zip(names, reads)
    ]
    batch_sam = [
        [rec.line() for rec in recs]
        for recs in align_batch(OPT, ref, fm, reads, make_batch_fn(OPT),
                                names=names)
    ]
    assert batch_sam == scalar_sam
