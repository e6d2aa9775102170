"""Packed-rank structures vs the scalar FM-index."""

import numpy as np
import pytest

from bwamem_tpu.index.build import build_index
from bwamem_tpu.index import fmindex as F
from bwamem_tpu.index.occ_packed import (
    extend_backward4,
    extend_forward4,
    pack_occ,
    rank4,
)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(6)
    pac = rng.integers(0, 5, 3000).astype(np.uint8)  # includes Ns
    pac[pac == 4] = np.where(rng.random((pac == 4).sum()) < 0.9, 0, 4)
    fm = build_index(pac)
    return fm, pack_occ(fm)


def test_rank4_matches_scalar(world):
    fm, po = world
    rng = np.random.default_rng(0)
    pos = rng.integers(0, fm.seq_len2 + 2, 500)
    got = rank4(po, pos)
    for k in range(0, 500, 17):
        for c in range(4):
            assert got[k, c] == fm.rank(c, int(pos[k])), (k, c)


def test_rank4_edges(world):
    fm, po = world
    got = rank4(po, np.array([0, 1, 63, 64, 65, fm.seq_len2 + 1]))
    for k, i in enumerate([0, 1, 63, 64, 65, fm.seq_len2 + 1]):
        for c in range(4):
            assert got[k, c] == fm.rank(c, i)


def test_extend_backward4_matches_scalar(world):
    fm, po = world
    rng = np.random.default_rng(1)
    iks = []
    for _ in range(40):
        c = int(rng.integers(0, 4))
        ik = F.interval_of_char(fm, c)
        for _ in range(int(rng.integers(0, 4))):
            exts = F.extend_backward(fm, ik)
            nz = [e for e in exts if e.s > 0]
            if not nz:
                break
            ik = nz[int(rng.integers(0, len(nz)))]
        iks.append(ik)
    x0 = np.array([k.x0 for k in iks])
    x1 = np.array([k.x1 for k in iks])
    s = np.array([k.s for k in iks])
    nx0, nx1, ns = extend_backward4(po, x0, x1, s)
    for k, ik in enumerate(iks):
        want = F.extend_backward(fm, ik)
        for c in range(4):
            assert (nx0[k, c], nx1[k, c], ns[k, c]) == \
                (want[c].x0, want[c].x1, want[c].s), (k, c)


def test_extend_forward4_matches_scalar(world):
    fm, po = world
    ik = F.interval_of_char(fm, 2)
    nx0, nx1, ns = extend_forward4(
        po, np.array([ik.x0]), np.array([ik.x1]), np.array([ik.s]))
    want = F.extend_forward(fm, ik)
    for c in range(4):
        assert (nx0[0, c], nx1[0, c], ns[0, c]) == \
            (want[c].x0, want[c].x1, want[c].s), c


def test_sa_value_batch(world):
    from bwamem_tpu.index.occ_packed import sa_value_batch
    fm, po = world
    rng = np.random.default_rng(2)
    rows = rng.integers(0, fm.seq_len2 + 1, 300)
    got = sa_value_batch(po, fm.ssa, fm.sa_intv, rows)
    for k in range(0, 300, 13):
        assert got[k] == fm.sa_value(int(rows[k])), k


def test_device_rank_and_extend_match_numpy(world):
    """The xp-generic expressions produce identical results under jnp."""
    from bwamem_tpu.ops.smem_jax import (
        DeviceOcc,
        extend_backward4_device,
        rank4_device,
    )
    fm, po = world
    d = DeviceOcc(po)
    rng = np.random.default_rng(3)
    pos = rng.integers(0, fm.seq_len2 + 1, 64)
    got = np.asarray(rank4_device(d, pos))
    want = rank4(po, pos)
    np.testing.assert_array_equal(got, want)
    x0 = pos[:16].astype(np.int64)
    s = rng.integers(1, 5, 16).astype(np.int64)
    x0 = np.minimum(x0, fm.seq_len2 - 5)
    nx0, nx1, ns = extend_backward4_device(d, x0, x0, s)
    wx0, wx1, ws = extend_backward4(po, x0, x0, s)
    np.testing.assert_array_equal(np.asarray(nx0), wx0)
    np.testing.assert_array_equal(np.asarray(ns), ws)


def test_device_path_no_dtype_truncation_warnings(world):
    """The xp=jnp paths must not request unavailable dtypes: an
    astype(np.int64) on a jax array canonicalizes to int32 with a
    per-call UserWarning — the narrowing is intended (device seeding is
    range-guarded < 2^31; wider texts route to the two-word sharded
    seeder), so the code must say so via _wide_int rather than warn."""
    import dataclasses
    import warnings

    import jax.numpy as jnp

    from bwamem_tpu.index.occ_packed import sa_value_batch

    fm, po = world
    po_d = dataclasses.replace(
        po, occ_rows=jnp.asarray(po.occ_rows),
        pk_rows=jnp.asarray(po.pk_rows), va_rows=jnp.asarray(po.va_rows),
        C=jnp.asarray(po.C))
    rng = np.random.default_rng(4)
    x0 = rng.integers(0, fm.seq_len2 - 5, 16).astype(np.int64)
    s = rng.integers(1, 5, 16).astype(np.int64)
    rows = rng.integers(0, fm.seq_len2 + 1, 32).astype(np.int64)
    ssa32 = np.asarray(fm.ssa, np.int64).astype(np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        nx0, nx1, ns = extend_backward4(
            po_d, jnp.asarray(x0), jnp.asarray(x0), jnp.asarray(s), jnp)
        vals = sa_value_batch(po_d, jnp.asarray(ssa32), fm.sa_intv,
                              jnp.asarray(rows), jnp)
    wx0, wx1, ws = extend_backward4(po, x0, x0, s)
    np.testing.assert_array_equal(np.asarray(nx0), wx0)
    np.testing.assert_array_equal(np.asarray(nx1), wx1)
    np.testing.assert_array_equal(np.asarray(ns), ws)
    np.testing.assert_array_equal(
        np.asarray(vals), sa_value_batch(po, fm.ssa, fm.sa_intv, rows))


def test_cache_roundtrip_bit_identical(world, tmp_path, monkeypatch):
    """The /tmp bench caches (bench/cachefmt.py) must round-trip both the
    FMIndex and PackedOcc with exact dtypes and values — dtype drift on
    occ_rows/pk_rows/C would silently corrupt GRCh38-scale ladder rows
    that start from a cache instead of a fresh build (ADVICE round 4)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "cachefmt", os.path.join(os.path.dirname(__file__), os.pardir,
                                 "bench", "cachefmt.py"))
    cachefmt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cachefmt)
    from bwamem_tpu.index.build import FMIndex
    from bwamem_tpu.index.occ_packed import PackedOcc

    fm, po = world
    monkeypatch.setattr(cachefmt, "idx_path",
                        lambda n: str(tmp_path / f"idx_{n}.npz"))
    monkeypatch.setattr(cachefmt, "occ_path",
                        lambda n: str(tmp_path / f"occ_{n}.npz"))
    n_bp = 3000
    cachefmt.save_idx(n_bp, fm)
    cachefmt.save_occ(n_bp, po)

    z = cachefmt.load_idx(n_bp)
    assert z is not None
    fm2 = FMIndex(l_pac=int(z["l_pac"]), seq_len2=int(z["seq_len2"]),
                  primary=int(z["primary"]), C=z["C"], bwt=z["bwt"],
                  occ_cp=z["occ_cp"], sa_intv=int(z["sa_intv"]),
                  ssa=z["ssa"], pac=z["pac"])
    for f in ("C", "bwt", "occ_cp", "ssa", "pac"):
        a, b = getattr(fm, f), getattr(fm2, f)
        assert a.dtype == b.dtype, f"idx {f} dtype drift: {a.dtype}->{b.dtype}"
        np.testing.assert_array_equal(a, b)
    for f in ("l_pac", "seq_len2", "primary", "sa_intv"):
        assert getattr(fm, f) == getattr(fm2, f)

    z = cachefmt.load_occ(n_bp)
    assert z is not None
    po2 = PackedOcc(occ_rows=z["occ_rows"], pk_rows=z["pk_rows"],
                    va_rows=z["va_rows"], C=z["C"],
                    primary=int(z["primary"]), n_rows=int(z["n_rows"]))
    for f in ("occ_rows", "pk_rows", "va_rows", "C"):
        a, b = getattr(po, f), getattr(po2, f)
        assert a.dtype == b.dtype, f"occ {f} dtype drift: {a.dtype}->{b.dtype}"
        np.testing.assert_array_equal(a, b)
    assert po.primary == po2.primary and po.n_rows == po2.n_rows

    # a wrong format version must force a rebuild, not a silent reuse
    monkeypatch.setattr(cachefmt, "OCC_FMT", cachefmt.OCC_FMT + 1)
    assert cachefmt.load_occ(n_bp) is None
    # a truncated file must fail closed too
    p = cachefmt.occ_path(n_bp)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) // 2])
    monkeypatch.setattr(cachefmt, "OCC_FMT", cachefmt.OCC_FMT - 1)
    assert cachefmt.load_occ(n_bp) is None
