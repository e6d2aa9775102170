"""Versioned, atomically-written /tmp benchmark caches.

The index/occ caches are keyed by n_bp alone; if the FMIndex or
PackedOcc layout ever changes, a stale cache would silently feed wrong
tables to a timed run.  Every cache therefore stores a format-version
field (`fmt`) that must match the code's current version on load — a
cache written before the field existed counts as version 1, which is
the current layout, so existing multi-GB caches stay valid until the
layout actually changes.  All writes go through .part + os.replace so
a crashed build can never leave a truncated npz that passes an
os.path.exists() gate.
"""
from __future__ import annotations

import os

import numpy as np

# bump these when the corresponding on-disk layout changes
IDX_FMT = 1   # FMIndex fields: l_pac seq_len2 primary C bwt occ_cp sa_intv ssa pac
OCC_FMT = 1   # PackedOcc fields: occ_rows pk_rows va_rows C primary n_rows

IDX_FIELDS = ("l_pac", "seq_len2", "primary", "C", "bwt", "occ_cp",
              "sa_intv", "ssa", "pac")
OCC_FIELDS = ("occ_rows", "pk_rows", "va_rows", "C", "primary", "n_rows")


def idx_path(n_bp: int) -> str:
    return f"/tmp/bwamem_bench_idx_{n_bp}.npz"


def occ_path(n_bp: int) -> str:
    return f"/tmp/bwamem_bench_occ_{n_bp}.npz"


def _load_checked(path: str, want_fmt: int, fields) -> "np.lib.npyio.NpzFile | None":
    """Load an npz cache; None if absent, wrong version, or unreadable."""
    if not os.path.exists(path):
        return None
    z = None
    try:
        z = np.load(path, allow_pickle=False)
        got_fmt = int(z["fmt"]) if "fmt" in z.files else 1
        if got_fmt != want_fmt or any(f not in z.files for f in fields):
            z.close()                 # don't leak the zip handle
            return None
        return z
    except Exception:
        if z is not None:
            z.close()
        return None


def load_idx(n_bp: int):
    return _load_checked(idx_path(n_bp), IDX_FMT, IDX_FIELDS)


def load_occ(n_bp: int):
    return _load_checked(occ_path(n_bp), OCC_FMT, OCC_FIELDS)


def _save_atomic(path: str, fmt: int, **arrays) -> None:
    tmp = path + ".part.npz"
    np.savez(tmp, fmt=fmt, **arrays)
    os.replace(tmp, path)


def save_idx(n_bp: int, fm) -> str:
    p = idx_path(n_bp)
    _save_atomic(p, IDX_FMT, l_pac=fm.l_pac, seq_len2=fm.seq_len2,
                 primary=fm.primary, C=fm.C, bwt=fm.bwt,
                 occ_cp=fm.occ_cp, sa_intv=fm.sa_intv, ssa=fm.ssa,
                 pac=fm.pac)
    return p


def save_occ(n_bp: int, po) -> str:
    p = occ_path(n_bp)
    _save_atomic(p, OCC_FMT, occ_rows=po.occ_rows, pk_rows=po.pk_rows,
                 va_rows=po.va_rows, C=po.C, primary=po.primary,
                 n_rows=po.n_rows)
    return p
