"""bwa-compatible CLI surface: -p interleaved PE, -C comment
pass-through, -P no-pairing, and runtime scoring flags (-A/-B/-O/-E/-L)
reaching the aligner (reference README.md invocation surface; bwa-0.7.8
mem flag semantics per fastmap.c main_mem)."""

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
    r = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "mem", "--backend", "jax",
         "--host", "native", "-b", "32", *extra],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    return r


def _body(r):
    return [l for l in r.stdout.splitlines() if not l.startswith("@")]


def _revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliflags")
    rng = np.random.default_rng(11)
    bases = "ACGT"
    seq = "".join(bases[i] for i in rng.integers(0, 4, 50000))
    fa = d / "ref.fa"
    with open(fa, "w") as f:
        f.write(">c1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")

    # FR library: read1 forward at pos, read2 = revcomp downstream
    n = 48
    r1s, r2s = [], []
    for i in range(n):
        pos = int(rng.integers(0, 50000 - 400))
        isz = int(rng.integers(250, 350))
        a = list(seq[pos:pos + 100])
        b = list(seq[pos + isz - 100:pos + isz])
        for p in (7, 55):
            a[p] = bases[int(rng.integers(0, 4))]
            b[p] = bases[int(rng.integers(0, 4))]
        r1s.append("".join(a))
        r2s.append(_revcomp("".join(b)))

    fq1, fq2 = d / "r1.fq", d / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(n):
            f1.write(f"@p{i} BC:Z:AAC{i}\n{r1s[i]}\n+\n{'I' * 100}\n")
            f2.write(f"@p{i} BC:Z:GGT{i}\n{r2s[i]}\n+\n{'I' * 100}\n")
    ilv = d / "interleaved.fq"
    with open(ilv, "w") as f:
        for i in range(n):
            f.write(f"@p{i} BC:Z:AAC{i}\n{r1s[i]}\n+\n{'I' * 100}\n")
            f.write(f"@p{i} BC:Z:GGT{i}\n{r2s[i]}\n+\n{'I' * 100}\n")

    env = _env()
    subprocess.run([sys.executable, "-m", "bwamem_tpu", "index", str(fa)],
                   env=env, check=True, capture_output=True, timeout=300)
    return d, fa, fq1, fq2, ilv, env, n


def test_interleaved_matches_two_file(world):
    d, fa, fq1, fq2, ilv, env, n = world
    two = _body(_mem(env, str(fa), str(fq1), str(fq2)))
    one = _body(_mem(env, "-p", str(fa), str(ilv)))
    assert one == two
    assert len(one) >= 2 * n


def test_device_seed_matches_host_seed(world):
    """--device-seed (SMEM + SA walks on device, mp_chunk_start_seeded)
    emits byte-identical SAM to the default C++ host seeding, SE and
    PE."""
    d, fa, fq1, fq2, ilv, env, n = world
    se_host = _body(_mem(env, str(fa), str(fq1)))
    se_dev = _body(_mem(env, "--device-seed", str(fa), str(fq1)))
    assert se_dev == se_host
    pe_host = _body(_mem(env, str(fa), str(fq1), str(fq2)))
    pe_dev = _body(_mem(env, "--device-seed", str(fa), str(fq1),
                        str(fq2)))
    assert pe_dev == pe_host


def test_comment_passthrough(world):
    d, fa, fq1, fq2, ilv, env, n = world
    recs = _body(_mem(env, "-C", str(fa), str(fq1), str(fq2)))
    for l in recs:
        cols = l.split("\t")
        flag = int(cols[1])
        want = "BC:Z:GGT" if flag & 0x80 else "BC:Z:AAC"
        assert cols[-1].startswith(want), l
    # and SE path too
    recs = _body(_mem(env, "-C", str(fa), str(fq1)))
    assert all(l.split("\t")[-1].startswith("BC:Z:AAC") for l in recs)


def test_skip_pairing(world):
    """-P (MEM_F_NOPAIRING): ends picked independently (bwa's
    `goto no_pairing`); a coincidental in-range pair STILL gets 0x2
    (bwa fastmap.c no_pairing block).  Native twin == Python twin."""
    d, fa, fq1, fq2, ilv, env, n = world
    nat = _body(_mem(env, "-P", str(fa), str(fq1), str(fq2)))
    py = _body(_mem(env, "-P", "--host", "python",
                    str(fa), str(fq1), str(fq2)))
    assert nat == py
    assert len(nat) >= 2 * n
    f40 = f80 = 0
    for l in nat:
        flag = int(l.split("\t")[1])
        assert flag & 0x1
        f40 += bool(flag & 0x40)
        f80 += bool(flag & 0x80)
    assert f40 >= n and f80 >= n


def test_explicit_insert_size(world):
    """-I mean,std: explicit FR distribution skips pestat inference;
    native twin == Python twin; in-window pairs still come out proper;
    a tiny forced window (-I 50,1,60,40) breaks proper pairing for the
    ~300 bp library."""
    d, fa, fq1, fq2, ilv, env, n = world
    nat = _body(_mem(env, "-I", "300,30", str(fa), str(fq1), str(fq2)))
    py = _body(_mem(env, "-I", "300,30", "--host", "python",
                    str(fa), str(fq1), str(fq2)))
    assert nat == py
    proper = sum(1 for l in nat if int(l.split("\t")[1]) & 0x2)
    assert proper >= 2 * n * 0.9
    # mis-specified window: nothing in [40, 60] => no proper pairs
    off = _body(_mem(env, "-I", "50,1,60,40", str(fa), str(fq1),
                     str(fq2)))
    assert all(not (int(l.split("\t")[1]) & 0x2) for l in off)


def test_scoring_flags_change_alignment(world):
    """-B/-O/-E reach the kernel: harsher mismatch penalty lowers AS."""
    d, fa, fq1, fq2, ilv, env, n = world
    base = _body(_mem(env, str(fa), str(fq1)))
    harsh = _body(_mem(env, "-B", "9", "-O", "16", str(fa), str(fq1)))

    def as_of(recs):
        tot = 0
        for l in recs:
            for c in l.split("\t")[11:]:
                if c.startswith("AS:i:"):
                    tot += int(c[5:])
        return tot

    assert as_of(harsh) < as_of(base)


def test_gzipped_inputs(world):
    """.fq.gz inputs stream through zlib exactly like plain FASTQ, and
    a .fa.gz reference indexes identically (bwa's kseq/zlib parity)."""
    import gzip
    import shutil

    d, fa, fq1, fq2, ilv, env, n = world
    gz1 = d / "r1.fq.gz"
    with open(fq1, "rb") as src, gzip.open(gz1, "wb") as dst:
        shutil.copyfileobj(src, dst)
    plain = _body(_mem(env, str(fa), str(fq1)))
    gzed = _body(_mem(env, str(fa), str(gz1)))
    assert [l.split("\t")[1:] for l in gzed] == \
        [l.split("\t")[1:] for l in plain]

    fagz = d / "ref2.fa.gz"
    with open(fa, "rb") as src, gzip.open(fagz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    subprocess.run([sys.executable, "-m", "bwamem_tpu", "index",
                    str(fagz)], env=env, check=True,
                   capture_output=True, timeout=300)
    via_gz = _body(_mem(env, str(fagz), str(fq1)))
    assert [l.split("\t")[1:] for l in via_gz] == \
        [l.split("\t")[1:] for l in plain]


def test_read_group(world):
    """-R '@RG\\tID:x\\t...' emits the @RG header AND RG:Z:x on every
    record (bwa attaches it in mem_aln2sam); native text path, native
    -C object path and python host all agree."""
    d, fa, fq1, fq2, ilv, env, n = world
    rg = r"@RG\tID:grp1\tSM:s1"
    for extra in ((), ("-C",), ("--host", "python")):
        r = _mem(env, "-R", rg, *extra, str(fa), str(fq1))
        hdr = [l for l in r.stdout.splitlines() if l.startswith("@RG")]
        assert hdr == ["@RG\tID:grp1\tSM:s1"], (extra, hdr)
        body = _body(r)
        assert body and all(
            l.count("\tRG:Z:grp1") == 1 for l in body), extra
    # PE path too
    r = _mem(env, "-R", rg, str(fa), str(fq1), str(fq2))
    assert all(l.count("\tRG:Z:grp1") == 1 for l in _body(r))


def test_verbosity_flag(world):
    d, fa, fq1, fq2, ilv, env, n = world
    r = _mem(env, "-v", "0", str(fa), str(fq1))
    assert "[mem] wrote" not in r.stderr
    r = _mem(env, "-v", "3", str(fa), str(fq1))
    assert "[mem] wrote" in r.stderr
