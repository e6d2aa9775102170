"""Device-side batched ksw_align (local SW, mate-rescue compute) must
match the scalar twin ops/local_ref.ksw_align exactly — score, all
four coordinates (bwa tie-breaking) and the KSW_XSUBO second-best."""

import numpy as np
import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.ops.local_jax import ksw_align_batch
from bwamem_tpu.ops.local_ref import ksw_align


def _rand_task(rng, maxq=60, maxt=120):
    qlen = int(rng.integers(1, maxq))
    tlen = int(rng.integers(1, maxt))
    if rng.random() < 0.6:
        # rescue-like: target window contains a mutated copy of query
        t = rng.integers(0, 4, tlen)
        q0 = int(rng.integers(0, max(tlen - qlen, 0) + 1))
        q = t[q0:q0 + qlen].copy()
        qlen = len(q)
        if qlen == 0:
            q = rng.integers(0, 4, 1)
            qlen = 1
        for _ in range(int(rng.integers(0, 4))):
            q[rng.integers(0, qlen)] = rng.integers(0, 4)
    else:
        q = rng.integers(0, 4, qlen)
        t = rng.integers(0, 4, tlen)
    if rng.random() < 0.15:
        q[rng.integers(0, len(q))] = 4
    if rng.random() < 0.15:
        t[rng.integers(0, len(t))] = 4
    return q.astype(np.int64), t.astype(np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    a, b = int(rng.integers(1, 4)), int(rng.integers(1, 6))
    o_del, e_del = int(rng.integers(1, 8)), int(rng.integers(1, 4))
    o_ins, e_ins = int(rng.integers(1, 8)), int(rng.integers(1, 4))
    mat = MemOptions(a=a, b=b).mat
    tasks = [_rand_task(rng) for _ in range(64)]
    got = ksw_align_batch(tasks, mat, o_del, e_del, o_ins, e_ins)
    for i, (q, t) in enumerate(tasks):
        want = ksw_align(q, t, mat, o_del, e_del, o_ins, e_ins,
                         use_native=False)
        assert got[i] == want, (i, q.tolist(), t.tolist(), got[i], want)


def test_rescue_scale_defaults():
    """Mate-rescue shapes at bwa defaults: 150 bp mate vs ~500 bp
    insert window, plus empty-task fast paths."""
    rng = np.random.default_rng(7)
    opt = MemOptions()
    tasks = []
    for _ in range(16):
        t = rng.integers(0, 4, 500)
        p = int(rng.integers(0, 350))
        q = t[p:p + 150].copy()
        for _ in range(4):
            q[rng.integers(0, 150)] = rng.integers(0, 4)
        tasks.append((q.astype(np.int64), t.astype(np.int64)))
    tasks.append((np.zeros(0, np.int64), np.array([1, 2])))
    got = ksw_align_batch(tasks, opt.mat, opt.o_del, opt.e_del,
                          opt.o_ins, opt.e_ins)
    for i, (q, t) in enumerate(tasks):
        want = ksw_align(q, t, opt.mat, opt.o_del, opt.e_del, opt.o_ins,
                         opt.e_ins, use_native=False)
        assert got[i] == want, (i, got[i], want)
