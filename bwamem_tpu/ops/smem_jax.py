"""Device-side (JAX) FM-index rank/extension primitives.

The packed-rank expressions in index/occ_packed.py are written xp-
generically; this module instantiates them under jax.numpy and jit so
rank queries can run on-device with the index resident in HBM — the
"FM-index in HBM, batched rank queries" building block of SURVEY.md
§7 step 3.

DECISION (round 2): production seeding stays on the HOST, in C++
(csrc/smem.cpp), not on device.  Measured at scale (bench/
index_scale.py): the native engine sustains tens of thousands of
reads/s at hundred-megabase-to-gigabase genomes — an order of
magnitude above the end-to-end pipeline rate — so seeding is provably
not the bottleneck, while a device SMEM would serialize dependent HBM
gathers per extension step (the classic FM-index latency chain) and
contend with the extension kernel for the chip.  This mirrors the
reference, whose seeding also runs host-side on CPU threads
(SURVEY.md §0).  These jitted primitives remain as the tested
device-resident rank path for anyone revisiting that trade-off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.index.occ_packed import (
    PackedOcc,
    extend_backward4 as _eb4,
    extend_forward4 as _ef4,
    rank4 as _rank4,
)


class DeviceOcc:
    """PackedOcc tables resident on the device (HBM)."""

    def __init__(self, po: PackedOcc):
        self.occ_rows = jnp.asarray(po.occ_rows)
        self.pk_rows = jnp.asarray(po.pk_rows)
        self.va_rows = jnp.asarray(po.va_rows)
        self.C = jnp.asarray(po.C)
        self.primary = po.primary
        self.n_rows = po.n_rows

    # duck-typed PackedOcc for the xp-generic expressions
    def _as_po(self):
        return self


@functools.partial(jax.jit, static_argnums=0)
def _rank4_dev(primary_n, occ_rows, pk_rows, va_rows, i):
    po = _Shim(occ_rows, pk_rows, va_rows, None, primary_n[0], primary_n[1])
    return _rank4(po, i, jnp)


class _Shim:
    def __init__(self, occ_rows, pk_rows, va_rows, C, primary, n_rows):
        self.occ_rows = occ_rows
        self.pk_rows = pk_rows
        self.va_rows = va_rows
        self.C = C
        self.primary = primary
        self.n_rows = n_rows


def rank4_device(d: DeviceOcc, i):
    """Batched rank query on device; i: jnp int array, any shape."""
    return _rank4_dev((d.primary, d.n_rows), d.occ_rows, d.pk_rows,
                      d.va_rows, jnp.asarray(i))


def extend_backward4_device(d: DeviceOcc, x0, x1, s):
    shim = _Shim(d.occ_rows, d.pk_rows, d.va_rows,
                 np.asarray(d.C), d.primary, d.n_rows)
    return _eb4(shim, jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(s), jnp)


def extend_forward4_device(d: DeviceOcc, x0, x1, s):
    shim = _Shim(d.occ_rows, d.pk_rows, d.va_rows,
                 np.asarray(d.C), d.primary, d.n_rows)
    return _ef4(shim, jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(s), jnp)
