"""bench.py's flag-adjudication plumbing (pure Python — no Spark):
canary-normalized anchor selection, the QUERY_HASHES definition-stamp
filter, the pre-r14 format migrations, and freshcheck JSON parsing.
The full loop (sweep -> flag -> fresh-subprocess verdict) runs live in
every bench invocation; these pin the arithmetic that decides which
timings may indict a plan."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(tmp_path, name, payload):
    with open(os.path.join(tmp_path, name), "w") as f:
        json.dump(payload, f)


def test_anchor_selects_canary_normalized_best(bench, tmp_path):
    """The r13 burst-poisoning case: a 0.318s sample at canary 0.66
    (box 1.5x reference speed) must NOT out-anchor an honest 0.40s
    sample at canary 1.0 — normalized they are 0.482 vs 0.400."""
    repo = str(tmp_path)
    _write(tmp_path, "QUERY_HASHES.json", {"q": {"round": 1}})
    _write(tmp_path, "BENCH_r02.json", {
        "sf": 0.1, "queries": {"q": 0.318},
        "canary": {"start_ratio": 0.66, "end_ratio": 0.66},
    })
    _write(tmp_path, "BENCH_r03.json", {
        "sf": 0.1, "queries": {"q": 0.40},
        "canary": {"start_ratio": 1.0, "end_ratio": 1.0},
    })
    anchors = bench._anchor_timings(repo, 0.1)
    sec, rnd, ratio = anchors["q"]
    assert (sec, rnd, ratio) == (0.40, 3, 1.0)


def test_anchor_respects_definition_stamp_and_sf(bench, tmp_path):
    """Timings from rounds BEFORE the query's QUERY_HASHES stamp, or
    at a different scale factor, never become anchors; a bench_full
    without a round key defaults to round 0 (pruned), not newest."""
    repo = str(tmp_path)
    _write(tmp_path, "QUERY_HASHES.json", {"q": {"round": 5}})
    _write(tmp_path, "BENCH_r04.json", {  # pre-stamp: pruned
        "sf": 0.1, "queries": {"q": 0.1},
    })
    _write(tmp_path, "BENCH_r06.json", {  # wrong sf: pruned
        "sf": 0.01, "queries": {"q": 0.05},
    })
    _write(tmp_path, "bench_full.json", {  # no round key -> round 0
        "sf": 0.1, "queries": {"q": 0.01},
    })
    assert bench._anchor_timings(repo, 0.1) == {}
    _write(tmp_path, "BENCH_r60.json", {"sf": 0.1, "queries": {}})
    _write(tmp_path, "BENCH_r07.json", {"sf": 0.1, "queries": {"q": 0.9}})
    anchors = bench._anchor_timings(repo, 0.1)
    assert anchors["q"][:2] == (0.9, 7)
    assert anchors["q"][2] == 1.0  # no canary fields -> reference speed


def test_anchor_reads_two_and_three_element_ratchet_entries(bench, tmp_path):
    """bench_full.json's anchors map migrates in place: pre-r14
    entries are [sec, round], r14+ are [sec, round, canary_ratio]."""
    repo = str(tmp_path)
    _write(tmp_path, "QUERY_HASHES.json", {"old": {"round": 1},
                                           "new": {"round": 1}})
    _write(tmp_path, "bench_full.json", {
        "sf": 0.1, "round": 2, "queries": {},
        "anchors": {"old": [1.5, 2], "new": [2.0, 3, 0.8]},
    })
    anchors = bench._anchor_timings(repo, 0.1)
    assert anchors["old"] == (1.5, 2, 1.0)
    assert anchors["new"] == (2.0, 3, 0.8)


def test_merge_anchors_ratchets_normalized(bench):
    anchors = {"q": (1.0, 2, 1.0)}
    # 0.9s on a 2x-slow box normalizes to 0.45 -> new anchor
    out = bench._merge_anchors(anchors, {"q": 0.9}, 5, 2.0)
    assert out["q"] == [0.9, 5, 2.0]
    # 0.8s at reference speed does NOT beat 0.9/2.0=0.45
    out2 = bench._merge_anchors({"q": (0.9, 5, 2.0)}, {"q": 0.8}, 6, 1.0)
    assert out2["q"] == [0.9, 5, 2.0]


def test_run_canary_ratio_handles_missing_fields(bench):
    assert bench._run_canary_ratio({}) == 1.0
    assert bench._run_canary_ratio(
        {"canary": {"start_ratio": 0.8, "end_ratio": 1.2}}) == 1.0
    assert bench._run_canary_ratio(
        {"canary": {"start_ratio": 0.5}}) == 0.5


def test_freshcheck_parses_last_matching_json_line(bench, tmp_path):
    """_freshcheck must find its JSON line amid warmup noise on
    stdout, and return None (never raise) when the subprocess fails —
    a broken recheck degrades to 'fresh-check-failed', not a dead
    bench."""
    fake = os.path.join(str(tmp_path), "bench.py")
    with open(fake, "w") as f:
        f.write(
            "import json, os\n"
            "print('warmup noise')\n"
            "print(json.dumps({'freshcheck':"
            " os.environ['SPARK_GRAFT_BENCH_FRESHCHECK'],"
            " 'min': 0.5, 'canary_ratio': 1.1}))\n"
        )
    rec = bench._freshcheck(str(tmp_path), "qx", "/nonexistent")
    assert rec == {"freshcheck": "qx", "min": 0.5, "canary_ratio": 1.1}
    with open(fake, "w") as f:
        f.write("raise SystemExit(3)\n")
    assert bench._freshcheck(str(tmp_path), "qx", "/nonexistent") is None
