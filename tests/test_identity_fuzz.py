"""Large randomized identity sweep: every accelerated path must produce
byte-identical SAM to the scalar golden pipeline.

This is the ASE-style system-level check (SURVEY.md §4): same "host",
swapped compute transport."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.index.build import build_index
from bwamem_tpu.index.occ_packed import pack_occ
from bwamem_tpu.io.fasta import Contig, Reference
from bwamem_tpu.ops.extend_jax import ExtendParams, extend_batch_core
from bwamem_tpu.pipeline.align import align_read, revcomp_read
from bwamem_tpu.pipeline.driver import align_batch
from bwamem_tpu.pipeline.pair import align_pairs

OPT = MemOptions()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(4242)
    pac = rng.integers(0, 4, 120000).astype(np.uint8)
    pac[100000:101000] = pac[50000:51000]     # planted duplication
    pac[70000:70100] = 4                      # N gap
    contigs = [Contig("c1", 0, 80000), Contig("c2", 80000, 40000)]
    ref = Reference(contigs=contigs, pac=pac)
    fm = build_index(pac)
    po = pack_occ(fm)
    params = ExtendParams(
        mat_flat=jnp.asarray(OPT.mat.astype(np.int32).ravel()), m=5,
        o_del=OPT.o_del, e_del=OPT.e_del, o_ins=OPT.o_ins,
        e_ins=OPT.e_ins, zdrop=OPT.zdrop)
    fn = lambda *a: extend_batch_core(*a, params)
    return ref, fm, po, fn


def hard_reads(rng, pac, n, L=120):
    reads = []
    for i in range(n):
        kind = i % 6
        pos = int(rng.integers(0, len(pac) - 2 * L))
        r = pac[pos:pos + L].astype(np.int64).copy()
        if kind == 1:   # heavy SNPs
            for _ in range(6):
                r[rng.integers(0, L)] = rng.integers(0, 5)
        elif kind == 2:  # indel
            p = int(rng.integers(20, L - 20))
            if i % 2:
                r = np.concatenate([r[:p], rng.integers(0, 4, 4), r[p:]])[:L]
            else:
                r = np.concatenate([r[:p], r[p + 3:]])
        elif kind == 3:  # duplication region (MAPQ 0 / XA territory)
            off = int(rng.integers(0, 900 - L))
            r = pac[50000 + off:50000 + off + L].astype(np.int64).copy()
        elif kind == 4:  # junction / N-gap straddlers
            base = [79950, 69950][i % 2]
            r = pac[base:base + L].astype(np.int64).copy()
        if i % 3 == 1:
            r = revcomp_read(r)
        reads.append(r)
    return reads


def test_se_batch_identity_sweep(world):
    ref, fm, po, fn = world
    rng = np.random.default_rng(77)
    reads = hard_reads(rng, ref.pac, 60)
    names = [f"s{i}" for i in range(len(reads))]
    scalar = [[r.line() for r in align_read(OPT, ref, fm, n, rd)]
              for n, rd in zip(names, reads)]
    batched = [[r.line() for r in recs] for recs in
               align_batch(OPT, ref, fm, reads, fn, names=names, po=po)]
    assert batched == scalar


def test_pe_batch_identity_sweep(world):
    ref, fm, po, fn = world
    rng = np.random.default_rng(88)
    r1s = hard_reads(rng, ref.pac, 30)
    # mates at plausible inserts from fresh positions (not tied to r1 —
    # exercises the no-pairing and rescue branches too)
    r2s = []
    for i in range(30):
        pos = int(rng.integers(0, ref.l_pac - 500))
        r2s.append(revcomp_read(
            ref.pac[pos + 200:pos + 320].astype(np.int64)))
    a = align_pairs(OPT, ref, fm, r1s, r2s)
    b = align_pairs(OPT, ref, fm, r1s, r2s, po=po, extend_batch_fn=fn)
    assert [[r.line() for r in x] for x in a] == \
        [[r.line() for r in x] for x in b]
