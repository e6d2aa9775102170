"""End-to-end single-end alignment: simulated reads -> SAM, checked
against simulation truth (position, strand, CIGAR, NM) and SAM internal
consistency."""

import numpy as np
import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.index.build import build_index
from bwamem_tpu.io.fasta import Contig, Reference, decode_seq
from bwamem_tpu.pipeline.align import align_read, revcomp_read

OPT = MemOptions()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(42)
    pac = rng.integers(0, 4, 60000).astype(np.uint8)
    contigs = [Contig("chr1", 0, 35000), Contig("chr2", 35000, 25000)]
    ref = Reference(contigs=contigs, pac=pac)
    fm = build_index(pac)
    return ref, fm, rng


def simulate(rng, ref, pos, length=100, snps=0, ins=0, dele=0, rev=False):
    """Extract a read from the reference with mutations; returns
    (read_codes, truth)."""
    seq = ref.pac[pos:pos + length].astype(np.int64).copy()
    for p in sorted(rng.choice(np.arange(10, length - 10), snps,
                               replace=False)) if snps else []:
        seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
    if ins:
        p = int(rng.integers(20, len(seq) - 20))
        seq = np.concatenate([seq[:p], rng.integers(0, 4, ins), seq[p:]])
    if dele:
        p = int(rng.integers(20, len(seq) - 20 - dele))
        seq = np.concatenate([seq[:p], seq[p + dele:]])
    if rev:
        seq = revcomp_read(seq)
    return seq


def primary_of(records):
    prim = [r for r in records if not (r.flag & 0x900) and not (r.flag & 0x4)]
    assert len(prim) == 1, [((r.flag), r.rname, r.pos) for r in records]
    return prim[0]


def check_consistency(rec, read_len):
    import re
    if rec.flag & 0x4:
        return
    ops = re.findall(r"(\d+)([MIDSH])", rec.cigar)
    qsum = sum(int(n) for n, op in ops if op in "MIS")
    assert qsum == read_len
    assert len(rec.seq) == read_len
    nm = dict((t[0], t[2]) for t in rec.tags)["NM"]
    assert nm >= 0


def test_exact_read_maps_exactly(world):
    ref, fm, rng = world
    read = simulate(rng, ref, 5000)
    recs = align_read(OPT, ref, fm, "r1", read)
    p = primary_of(recs)
    assert p.rname == "chr1" and p.pos == 5001
    assert p.cigar == "100M"
    assert p.mapq > 0
    assert dict((t[0], t[2]) for t in p.tags)["NM"] == 0


def test_read_on_chr2(world):
    ref, fm, rng = world
    read = simulate(rng, ref, 40000)
    p = primary_of(align_read(OPT, ref, fm, "r2", read))
    assert p.rname == "chr2" and p.pos == 40000 - 35000 + 1
    assert p.cigar == "100M"


def test_snp_read(world):
    ref, fm, rng = world
    read = simulate(rng, ref, 12000, snps=3)
    p = primary_of(align_read(OPT, ref, fm, "r3", read))
    assert p.rname == "chr1" and p.pos == 12001
    assert p.cigar == "100M"
    assert dict((t[0], t[2]) for t in p.tags)["NM"] == 3


def test_insertion_read(world):
    ref, fm, rng = world
    read = simulate(rng, ref, 20000, ins=4)
    p = primary_of(align_read(OPT, ref, fm, "r4", read))
    assert p.rname == "chr1" and p.pos == 20001
    assert "4I" in p.cigar
    check_consistency(p, len(read))


def test_deletion_read(world):
    ref, fm, rng = world
    read = simulate(rng, ref, 25000, dele=5)
    p = primary_of(align_read(OPT, ref, fm, "r5", read))
    assert p.pos == 25001
    assert "5D" in p.cigar
    check_consistency(p, len(read))


def test_reverse_strand_read(world):
    ref, fm, rng = world
    read = simulate(rng, ref, 8000, snps=1, rev=True)
    p = primary_of(align_read(OPT, ref, fm, "r6", read))
    assert p.flag & 0x10
    assert p.rname == "chr1" and p.pos == 8001
    assert p.cigar == "100M"
    # SEQ is printed on the forward strand
    assert p.seq == decode_seq(revcomp_read(read))


def test_soft_clipped_chimera(world):
    ref, fm, rng = world
    # half maps to chr1, half is random junk -> soft clip
    left = ref.pac[30000:30060].astype(np.int64)
    junk = rng.integers(0, 4, 40)
    read = np.concatenate([left, junk])
    p = primary_of(align_read(OPT, ref, fm, "r7", read))
    assert p.pos == 30001
    assert p.cigar.startswith("60M") and p.cigar.endswith("S")
    check_consistency(p, len(read))


def test_unmappable_read(world):
    ref, fm, rng = world
    read = np.full(80, 4, np.int64)  # all N
    recs = align_read(OPT, ref, fm, "r8", read)
    assert len(recs) == 1
    assert recs[0].flag & 0x4
    assert recs[0].cigar == "*"


def test_batch_of_reads_all_place(world):
    ref, fm, rng = world
    ok = 0
    n = 30
    for i in range(n):
        pos = int(rng.integers(0, ref.l_pac - 150))
        rev = bool(rng.integers(0, 2))
        read = simulate(rng, ref, pos, snps=int(rng.integers(0, 4)), rev=rev)
        recs = align_read(OPT, ref, fm, f"b{i}", read)
        if 35000 - 150 < pos < 35000:
            # contig-junction reads are correctly dropped (bwa parity)
            n -= 1
            continue
        p = primary_of(recs)
        rid = 0 if pos < 35000 else 1
        want_pos = pos - ref.contigs[rid].offset + 1
        if (p.rname == ref.contigs[rid].name and p.pos == want_pos
                and bool(p.flag & 0x10) == rev):
            ok += 1
        check_consistency(p, len(read))
    assert ok >= n - 1  # allow an occasional repeat-induced ambiguity


def test_mapq_zero_for_duplicated_segment():
    rng = np.random.default_rng(7)
    seg = rng.integers(0, 4, 2000).astype(np.uint8)
    pac = np.concatenate([seg, rng.integers(0, 4, 1000).astype(np.uint8),
                          seg])  # exact 2 kb duplication
    ref = Reference(contigs=[Contig("c", 0, len(pac))], pac=pac)
    fm = build_index(pac)
    read = pac[500:600].astype(np.int64)
    recs = align_read(OPT, ref, fm, "dup", read)
    p = primary_of(recs)
    assert p.mapq == 0  # ambiguous between the two copies
    # with -a the secondary copy is also reported
    secondaries = [r for r in recs if r.flag & 0x100]
    assert len(secondaries) >= 1


def test_xa_tag_without_flag_a():
    """Duplicated locus + -a off: one record with an XA alternate."""
    from bwamem_tpu.config import MemOptions
    rng = np.random.default_rng(7)
    seg = rng.integers(0, 4, 2000).astype(np.uint8)
    pac = np.concatenate([seg, rng.integers(0, 4, 1000).astype(np.uint8),
                          seg])
    ref = Reference(contigs=[Contig("c", 0, len(pac))], pac=pac)
    fm = build_index(pac)
    read = pac[500:600].astype(np.int64)
    opt = MemOptions(flag_a=False)
    recs = align_read(opt, ref, fm, "dup", read)
    assert len(recs) == 1
    tags = dict((t[0], t[2]) for t in recs[0].tags)
    assert "XA" in tags
    alt = tags["XA"].rstrip(";").split(",")
    assert alt[0] == "c" and alt[2] == "100M"
    # the alternate is the other copy of the duplication
    assert abs(int(alt[1].lstrip("+-")) - 3501) < 5


def test_contig_junction_alignment_rejected():
    """Junction handling on the concatenated reference:
    (a) a read whose only (exact) seed bridges two contigs ends up
        unmapped (bwa drops bridging alignments);
    (b) a read seeded inside one contig whose EXTENSION would cross the
        junction gets soft-clipped at the contig end (bns_fetch_seq
        restricts the window to one contig)."""
    rng = np.random.default_rng(21)
    pac = rng.integers(0, 4, 4000).astype(np.uint8)
    ref = Reference(contigs=[Contig("a", 0, 2000), Contig("b", 2000, 2000)],
                    pac=pac)
    fm = build_index(pac)

    # (a) fully bridging exact read -> unmapped
    read = pac[1950:2050].astype(np.int64)
    recs = align_read(OPT, ref, fm, "jx", read)
    assert all(r.flag & 0x4 for r in recs)

    # (b) seeds in contig a, tail crosses into b but is mutated so no
    # seed bridges; extension must clip at the contig end
    read2 = pac[1930:2030].astype(np.int64).copy()
    for p_ in range(60, 100, 9):
        read2[p_] = (read2[p_] + 1) % 4
    recs2 = align_read(OPT, ref, fm, "jc", read2)
    mapped = [r for r in recs2 if not r.flag & 0x4]
    assert mapped
    import re as _re
    for r in mapped:
        span = sum(int(n) for n, op in _re.findall(r"(\d+)([MD])", r.cigar))
        assert r.rname == "a"
        assert r.pos + span - 1 <= 2000, (r.rname, r.pos, r.cigar)
