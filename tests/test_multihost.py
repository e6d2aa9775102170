"""Multi-host sharding and ordered SAM merge."""

import numpy as np

from bwamem_tpu.parallel.multihost import (
    merge_sam_files,
    merge_sams,
    shard_reads,
)


def test_shard_reads_partition():
    n, k = 103, 4
    all_idx = sorted(i for s in range(k) for i in shard_reads(n, s, k))
    assert all_idx == list(range(n))


def test_merge_sams_restores_order():
    # 3 shards, 10 reads, strided assignment
    n, k = 10, 3
    groups = [[[f"r{i}\tline1\n", f"r{i}\tline2\n"]
               for i in shard_reads(n, s, k)] for s in range(k)]
    merged = list(merge_sams([iter(g) for g in groups]))
    names = [g[0].split("\t")[0] for g in merged]
    assert names == [f"r{i}" for i in range(n)]


def test_merge_sam_files(tmp_path):
    n, k = 12, 3
    hdr = "@HD\tVN:1.5\n@SQ\tSN:c\tLN:100\n"
    paths = []
    for s in range(k):
        p = tmp_path / f"shard{s}.sam"
        with open(p, "w") as f:
            f.write(hdr)
            for i in shard_reads(n, s, k):
                f.write(f"q{i}\t0\tc\t{i+1}\t60\t5M\t*\t0\t0\tACGTA\t*\n")
                if i % 2:  # supplementary second record for some reads
                    # (extra records of a unit are always flagged
                    # secondary 0x100 or supplementary 0x800 — the
                    # sam_units grouping contract)
                    f.write(f"q{i}\t2064\tc\t{i+5}\t60\t5M\t*\t0\t0"
                            f"\tACGTA\t*\n")
        paths.append(str(p))
    out = tmp_path / "merged.sam"
    nrec = merge_sam_files(paths, str(out))
    lines = open(out).read().splitlines()
    assert lines[0].startswith("@HD")
    body = [l for l in lines if not l.startswith("@")]
    assert nrec == len(body) == 12 + 6
    names = []
    for l in body:
        nm = l.split("\t")[0]
        if not names or names[-1] != nm:
            names.append(nm)
    assert names == [f"q{i}" for i in range(n)]
