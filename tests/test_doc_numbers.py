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


def _newest(pattern: str):
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    return paths[-1] if paths else None


def test_newest_ladder_rows_are_curated():
    path = _newest("bench_out_r*/ladder.json")
    assert path, "no ladder.json captured"
    with open(path) as f:
        ladder = json.load(f)
    results = _load_results()
    missing, drifted = [], []
    for row, rec in ladder.items():
        if not rec.get("stable"):
            continue  # unstable rows must not be headlined
        if row not in results:
            missing.append(row)
            continue
        want = float(results[row]["value"])
        got = float(rec["best"])
        if abs(got - want) > EXACT_REL * max(got, want):
            drifted.append((row, got, want))
    assert not missing and not drifted, (
        f"{os.path.relpath(path, REPO)} has stable rows not reflected in "
        f"bench/RESULTS.json — missing={missing} drifted={drifted}")


def test_newest_bench_json_agrees_with_quoted_gcups():
    path = _newest("BENCH_r0*.json")
    if path is None:
        pytest.skip("no BENCH_rNN.json yet")
    with open(path) as f:
        bench = json.load(f)
    captured = float(bench["parsed"]["value"])
    quoted = float(_load_results()["gcups"]["value"])
    assert abs(captured - quoted) <= NOISE_REL * max(captured, quoted), (
        f"{os.path.basename(path)} measured {captured} GCUPS but the docs "
        f"quote {quoted} — reconcile (noise allowance {NOISE_REL:.0%})")


def test_no_stale_round2_headlines():
    # the specific stale numbers the round-3 verdict flagged
    for doc in ("README.md", os.path.join("bench", "README.md"),
                "PARITY.md"):
        with open(os.path.join(REPO, doc)) as f:
            text = f.read()
        for stale in ("24.7 GCUPS", "~23.7"):
            assert stale not in text, f"{doc} still quotes stale {stale!r}"
