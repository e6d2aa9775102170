"""Headline numbers in the docs must equal captured benchmark artifacts.

Round-3 verdict: README said 24.7 GCUPS while the captured benchmark said
41.2 — three documents quoted numbers no artifact contained.  This test
makes that drift fail loudly, in three directions:

1. every entry in bench/RESULTS.json must equal what its named source
   artifact actually recorded (the artifact is re-parsed here);
2. every entry's `quote` string must appear verbatim in each doc listed
   in `quoted_in` (so editing RESULTS.json without editing the docs, or
   vice versa, fails);
3. the NEWEST tracked ladder.json's stable rows must be represented in
   RESULTS.json with matching values (so capturing a new measurement
   without updating the headline docs fails), and the newest BENCH_r*.json
   must agree with the quoted GCUPS within run-to-run noise.

No benchmarks run here — this only cross-checks committed files.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

RESULTS = os.path.join(REPO, "bench", "RESULTS.json")

# run-to-run noise allowance when comparing two *different* captures of
# the same benchmark (e.g. README's gcups vs the driver's BENCH_rNN.json);
# exact-source checks use a much tighter bound.
NOISE_REL = 0.15
EXACT_REL = 0.005


def _load_results():
    with open(RESULTS) as f:
        d = json.load(f)
    d.pop("_doc", None)
    return d


def _read_source(source: str):
    """Parse '<file>#<dot.path>' or a file whose last line is JSON/float."""
    if "#" in source:
        path, dotted = source.split("#", 1)
        with open(os.path.join(REPO, path)) as f:
            node = json.load(f)
        for k in dotted.split("."):
            node = node[k]
        return float(node)
    fp = os.path.join(REPO, source)
    with open(fp) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for ln in reversed(lines):
        try:
            d = json.loads(ln)
            if isinstance(d, dict) and "value" in d:
                return float(d["value"])
        except ValueError:
            pass
        try:
            return float(ln)
        except ValueError:
            continue
    raise AssertionError(f"no numeric tail line in {source}")


def test_results_match_artifacts():
    for key, ent in _load_results().items():
        got = _read_source(ent["source"])
        want = float(ent["value"])
        assert abs(got - want) <= EXACT_REL * max(abs(got), abs(want)), (
            f"RESULTS.json[{key}]={want} but its source "
            f"{ent['source']} records {got} — re-capture or fix RESULTS")


def test_docs_quote_results():
    for key, ent in _load_results().items():
        for doc in ent["quoted_in"]:
            with open(os.path.join(REPO, doc)) as f:
                text = f.read()
            assert ent["quote"] in text, (
                f"{doc} does not contain the captured headline "
                f"'{ent['quote']}' for {key} — reconcile the doc")


def _round_key(path: str):
    """Sort bench artifacts by ROUND NUMBER, not lexicographically —
    'bench_out_r10' sorts before 'bench_out_r4' as a string (and
    'BENCH_r10.json' after 'BENCH_r04.json' only by luck of zero
    padding).  Ties (r4 vs r4b) break on the path string."""
    import re

    m = re.search(r"_r(\d+)", os.path.basename(os.path.dirname(path))
                  or os.path.basename(path)) or re.search(r"_r(\d+)",
                                                          path)
    return (int(m.group(1)) if m else -1, path)


def _newest(pattern: str):
    paths = sorted(glob.glob(os.path.join(REPO, pattern)),
                   key=_round_key)
    return paths[-1] if paths else None


# ladder row name -> RESULTS.json key when they differ
_LADDER_ALIASES = {"multihost": "multihost_pct_linear"}


def test_newest_ladder_rows_are_curated():
    """Each row's NEWEST stable capture (across every tracked ladder.json)
    must be curated in RESULTS.json with a matching value.  Checking only
    the newest *file* would let a subset re-run (e.g. one row in a fresh
    bench_out_rN/) shadow every previously captured stable row."""
    paths = sorted(glob.glob(os.path.join(REPO, "bench_out_r*/ladder.json")),
                   key=_round_key)
    assert paths, "no ladder.json captured"
    newest_stable = {}  # row -> (path, rec); later paths overwrite
    for path in paths:
        with open(path) as f:
            ladder = json.load(f)
        for row, rec in ladder.items():
            if rec.get("stable"):
                newest_stable[row] = (path, rec)
    results = _load_results()
    missing, drifted = [], []
    for row, (path, rec) in newest_stable.items():
        key = _LADDER_ALIASES.get(row, row)
        if key not in results:
            missing.append((row, os.path.relpath(path, REPO)))
            continue
        if isinstance(rec["best"], dict):
            # multihost-style rows: the curated value is a derived scalar
            # (e.g. % linear) checked against its own source artifact by
            # test_results_match_artifacts; presence is what we pin here.
            continue
        want = float(results[key]["value"])
        got = float(rec["best"])
        if abs(got - want) > EXACT_REL * max(got, want):
            drifted.append((row, got, want, os.path.relpath(path, REPO)))
    assert not missing and not drifted, (
        "stable ladder rows not reflected in bench/RESULTS.json — "
        f"missing={missing} drifted={drifted}")


def test_newest_bench_json_agrees_with_quoted_gcups():
    path = _newest("BENCH_r*.json")
    if path is None:
        pytest.skip("no BENCH_rNN.json yet")
    with open(path) as f:
        bench = json.load(f)
    captured = float(bench["parsed"]["value"])
    quoted = float(_load_results()["gcups"]["value"])
    assert abs(captured - quoted) <= NOISE_REL * max(captured, quoted), (
        f"{os.path.basename(path)} measured {captured} GCUPS but the docs "
        f"quote {quoted} — reconcile (noise allowance {NOISE_REL:.0%})")


def _acceptable_number_strings():
    """Every number string derivable from a tracked measurement: the
    RESULTS.json quotes/values, every run value in every tracked
    ladder.json, every numeric-tail bench_out_r*/ *.out artifact, and
    every '<float> reads/s' a tracked .err/.log recorded.  Each value
    is admitted in comma form, NN.Nk form, floor and round-half-up,
    plus its half (PE docs quote pairs/s = reads/s / 2)."""
    import math
    import re

    acc: set[str] = set()

    def fmt(v):
        try:
            v = float(v)
        except (TypeError, ValueError):
            return
        for f in (math.floor(v), math.floor(v + 0.5)):
            acc.add(f"{int(f):,}")
        for kv in (math.floor(v / 100) / 10, math.floor(v / 100 + 0.5) / 10):
            acc.add(f"{kv:.1f}k")

    def fmt2(v):
        try:
            v = float(v)
        except (TypeError, ValueError):
            return
        fmt(v)
        fmt(v / 2)

    for ent in _load_results().values():
        acc.add(ent["quote"])
        fmt2(ent["value"])
    for p in glob.glob(os.path.join(REPO, "bench_out_r*/ladder.json")):
        with open(p) as f:
            ladder = json.load(f)
        for rec in ladder.values():
            b = rec.get("best")
            vals = list(b.values()) if isinstance(b, dict) else [b]
            for r in rec.get("runs", []):
                v = r.get("value")
                vals.extend(v.values() if isinstance(v, dict) else [v])
            for v in vals:
                fmt2(v)
    for p in glob.glob(os.path.join(REPO, "bench_out_r*/*.out")):
        with open(p, errors="replace") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        for ln in reversed(lines):
            try:
                d = json.loads(ln)
                if isinstance(d, dict):
                    for v in d.values():
                        fmt2(v)
                    break
            except ValueError:
                pass
            try:
                fmt2(float(ln))
                break
            except ValueError:
                continue
    for pat in ("bench_out_r*/*.err", "bench_out_r*/*.log",
                "bench_out_r*/*.out"):
        for p in glob.glob(os.path.join(REPO, pat)):
            with open(p, errors="replace") as f:
                for ln in f:
                    for m in re.finditer(r"(\d+(?:\.\d+)?) reads/s", ln):
                        fmt2(m.group(1))
    return acc


# Measurements from rounds 2-3 whose raw runs predate the bench_out_r*/
# artifact discipline; they live in clearly round-labelled historical
# sections of bench/README.md and are FROZEN here — adding any NEW
# untracked number to the docs fails the scan below, and so does
# deleting a historical section without pruning its entry here.
_FROZEN_HISTORICAL = {
    "15,213", "14,851", "14,390", "5,215",   # round-2 e2e table
    "20.2k", "28.2k",                        # round-2b depth ladder
    "3,366", "8,332", "4,913",               # round-2 rescue A/B
    "9.4k",                                  # round-2 index-scale table
    "23.9k",                                 # round-2 -t scaling table
}


def test_benchreadme_prose_numbers_resolve():
    """Round-4 verdict (weak #3): prose numbers in bench/README.md could
    bypass the headline drift checks.  Scan every comma-formatted or
    NN.Nk-formatted figure; each must resolve to a tracked measurement
    (see _acceptable_number_strings) or be a frozen pre-discipline
    historical value.  Round run-size parameters (1,000,000 etc.) are
    exempt."""
    import re

    acc = _acceptable_number_strings() | _FROZEN_HISTORICAL
    with open(os.path.join(REPO, "bench", "README.md")) as f:
        text = f.read()
    nums = re.findall(r"\b\d{1,3}(?:,\d{3})+(?:\.\d+)?\b|\b\d+\.\d+k\b",
                      text)
    orphans = sorted({
        n for n in nums
        if not re.fullmatch(r"\d{1,3}(?:,000)+", n) and n not in acc})
    assert not orphans, (
        "bench/README.md quotes numbers no tracked artifact records — "
        f"capture them (bench_out_r*/) and curate, or reword: {orphans}")


def test_toplevel_docs_prose_numbers_resolve():
    """Same scan over README.md and PARITY.md (no historical exemptions
    there — both quote only curated headlines)."""
    import re

    acc = _acceptable_number_strings()
    for doc in ("README.md", "PARITY.md"):
        with open(os.path.join(REPO, doc)) as f:
            text = f.read()
        nums = re.findall(
            r"\b\d{1,3}(?:,\d{3})+(?:\.\d+)?\b|\b\d+\.\d+k\b", text)
        orphans = sorted({
            n for n in nums
            if not re.fullmatch(r"\d{1,3}(?:,000)+", n) and n not in acc})
        assert not orphans, (
            f"{doc} quotes numbers no tracked artifact records: {orphans}")


def test_no_stale_round2_headlines():
    # the specific stale numbers the round-3 verdict flagged
    for doc in ("README.md", os.path.join("bench", "README.md"),
                "PARITY.md"):
        with open(os.path.join(REPO, doc)) as f:
            text = f.read()
        for stale in ("24.7 GCUPS", "~23.7"):
            assert stale not in text, f"{doc} still quotes stale {stale!r}"
