"""Benchmark cache round-trips (bench/cachefmt.py): the PackedOcc /
FMIndex npz save+load must reproduce every array bit-identically WITH
exact dtypes — dtype drift (int32/uint32/int64) through np.savez would
silently corrupt rank arithmetic in timed runs (ADVICE round 4 #4).
Also pins the format-version gate and the atomic-write discipline."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "bench"))
import cachefmt  # noqa: E402

from bwamem_tpu.index.build import build_index  # noqa: E402
from bwamem_tpu.index.occ_packed import pack_occ  # noqa: E402

N_BP = 1017  # a size no benchmark uses; safe to create/remove in /tmp


def _cleanup():
    for p in (cachefmt.idx_path(N_BP), cachefmt.occ_path(N_BP)):
        if os.path.exists(p):
            os.remove(p)


def test_idx_and_occ_roundtrip_bitexact():
    rng = np.random.default_rng(31)
    pac = rng.integers(0, 4, N_BP).astype(np.uint8)
    fm = build_index(pac)
    po = pack_occ(fm)
    _cleanup()
    try:
        cachefmt.save_idx(N_BP, fm)
        cachefmt.save_occ(N_BP, po)
        z = cachefmt.load_idx(N_BP)
        assert z is not None
        for field, want in (("C", fm.C), ("bwt", fm.bwt),
                            ("occ_cp", fm.occ_cp), ("ssa", fm.ssa),
                            ("pac", fm.pac)):
            got = z[field]
            assert got.dtype == np.asarray(want).dtype, (field, got.dtype)
            assert np.array_equal(got, want), field
        for field, want in (("l_pac", fm.l_pac), ("seq_len2", fm.seq_len2),
                            ("primary", fm.primary),
                            ("sa_intv", fm.sa_intv)):
            assert int(z[field]) == int(want), field
        zo = cachefmt.load_occ(N_BP)
        assert zo is not None
        for field, want in (("occ_rows", po.occ_rows),
                            ("pk_rows", po.pk_rows),
                            ("va_rows", po.va_rows), ("C", po.C)):
            got = zo[field]
            assert got.dtype == np.asarray(want).dtype, (field, got.dtype)
            assert np.array_equal(got, want), field
        assert int(zo["primary"]) == int(po.primary)
        assert int(zo["n_rows"]) == int(po.n_rows)
    finally:
        _cleanup()


def test_version_gate_and_missing_fields():
    rng = np.random.default_rng(32)
    pac = rng.integers(0, 4, N_BP).astype(np.uint8)
    po = pack_occ(build_index(pac))
    _cleanup()
    try:
        cachefmt.save_occ(N_BP, po)
        # wrong version -> load refuses (returns None, forcing a rebuild)
        old = cachefmt.OCC_FMT
        cachefmt.OCC_FMT = old + 1
        try:
            assert cachefmt.load_occ(N_BP) is None
        finally:
            cachefmt.OCC_FMT = old
        assert cachefmt.load_occ(N_BP) is not None
        # a truncated file (a crashed non-atomic writer) must not load
        with open(cachefmt.occ_path(N_BP), "wb") as f:
            f.write(b"PK\x03\x04garbage")
        assert cachefmt.load_occ(N_BP) is None
        # and save never leaves a .part behind
        cachefmt.save_occ(N_BP, po)
        assert not os.path.exists(cachefmt.occ_path(N_BP) + ".part.npz")
        assert cachefmt.load_occ(N_BP) is not None
    finally:
        _cleanup()
