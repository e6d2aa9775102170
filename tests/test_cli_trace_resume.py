"""CLI tracing + checkpoint/resume: a killed run resumes from the
manifest, and the trace file records per-batch device seconds/cells
(the DSM perf-counter + transaction.tsv analogues, wired into the real
pipeline)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from bwamem_tpu.pipeline import native_driver

pytestmark = pytest.mark.skipif(not native_driver.available(),
                                reason="native library unavailable")


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""))
    return env


def _mem(env, *extra):
    return subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "mem", "--backend", "jax",
         "--host", "native", "-b", "40", *extra],
        env=env, capture_output=True, text=True, timeout=600)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(5)
    bases = "ACGT"
    seq = "".join(bases[i] for i in rng.integers(0, 4, 40000))
    fa = d / "ref.fa"
    with open(fa, "w") as f:
        f.write(">c1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    fq = d / "reads.fq"
    with open(fq, "w") as f:
        for i in range(120):
            pos = int(rng.integers(0, 40000 - 110))
            r = list(seq[pos:pos + 100])
            # mutations at the edges force real extension tasks
            for p in (3, 50, 96):
                r[p] = bases[int(rng.integers(0, 4))]
            f.write(f"@x{i}\n{''.join(r)}\n+\n{'I' * 100}\n")
    env = _env()
    subprocess.run([sys.executable, "-m", "bwamem_tpu", "index", str(fa)],
                   env=env, check=True, capture_output=True, timeout=300)
    return d, fa, fq, env


def test_trace_and_resume(world):
    d, fa, fq, env = world
    trace = d / "trace.jsonl"
    manifest = d / "manifest.jsonl"

    r1 = _mem(env, "--trace", str(trace), "--resume", str(manifest),
              str(fa), str(fq))
    assert r1.returncode == 0, r1.stderr
    recs1 = [l for l in r1.stdout.splitlines() if not l.startswith("@")]
    assert len(recs1) == 120

    # trace: per-batch records with kind/cells/seconds + counters line
    lines = [json.loads(l) for l in open(trace)]
    kinds = {l["kind"] for l in lines}
    assert any(k.startswith("extend_L") for k in kinds)
    assert any(k.startswith("extend_R") for k in kinds)
    assert "host_chunk" in kinds          # per-chunk host seed+chain rows
    assert all(l["sec"] >= 0 for l in lines)
    assert sum(l.get("cells", 0) for l in lines) > 0
    assert sum(l["reads"] for l in lines
               if l["kind"] == "host_chunk") == 120
    assert "[mem] counters:" in r1.stderr
    ctr = json.loads(r1.stderr.split("[mem] counters: ")[1].splitlines()[0])
    assert ctr["reads"] == 120 and ctr["device_batches"] >= 6

    # manifest holds the three completed 40-read chunks
    ranges = [json.loads(l) for l in open(manifest)]
    assert [(x["start"], x["end"]) for x in ranges] == \
        [(0, 40), (40, 80), (80, 120)]

    # resume with everything done: no records re-aligned
    r2 = _mem(env, "--resume", str(manifest), str(fa), str(fq))
    assert r2.returncode == 0, r2.stderr
    recs2 = [l for l in r2.stdout.splitlines() if not l.startswith("@")]
    assert recs2 == []

    # simulate a kill after 2 chunks: drop the last range, resume must
    # re-align exactly the missing 40 reads
    with open(manifest, "w") as f:
        for x in ranges[:2]:
            f.write(json.dumps(x) + "\n")
    r3 = _mem(env, "--resume", str(manifest), str(fa), str(fq))
    assert r3.returncode == 0, r3.stderr
    recs3 = [l for l in r3.stdout.splitlines() if not l.startswith("@")]
    assert len(recs3) == 40
    assert recs3 == recs1[80:]
    ranges3 = [json.loads(l) for l in open(manifest)]
    assert [(x["start"], x["end"]) for x in ranges3] == \
        [(0, 40), (40, 80), (80, 120)]
