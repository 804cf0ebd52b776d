"""bench.py's flag-adjudication plumbing (pure Python — no Spark):
median-of-run-minima anchors, the QUERY_HASHES definition-stamp
filter, the pre-r14 format migrations, and freshcheck JSON parsing.
The full loop (sweep -> flag -> fresh-subprocess verdict) runs live in
every bench invocation; these pin the arithmetic that decides which
timings may indict a plan."""

from __future__ import annotations

import importlib.util
import json
import os

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


def test_median_anchor_outvotes_burst_run(bench, tmp_path):
    """The r13 burst-poisoning case, solved without host-speed
    inference: a 0.318s favorable-burst sample must not set the bar
    when honest runs read ~0.6s — the median of per-run minima makes
    it one outvoted sample."""
    repo = str(tmp_path)
    _write(tmp_path, "QUERY_HASHES.json", {"q": {"round": 1}})
    for rnd, sec in [(2, 0.318), (3, 0.62), (4, 0.58)]:
        _write(tmp_path, f"BENCH_r0{rnd}.json",
               {"sf": 0.1, "queries": {"q": sec}})
    hist = bench._anchor_history(repo, 0.1)
    sec, rnd, _ratio = bench._anchor_of(hist["q"])
    assert sec == 0.58  # median of {0.318, 0.58, 0.62}
    assert rnd == 4  # newest round in the history, for display


def test_history_respects_definition_stamp_and_sf(bench, tmp_path):
    """Timings from rounds BEFORE the query's QUERY_HASHES stamp, or
    at a different scale factor, never enter the history; a bench_full
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
    assert bench._anchor_history(repo, 0.1) == {}
    _write(tmp_path, "BENCH_r07.json", {"sf": 0.1, "queries": {"q": 0.9}})
    hist = bench._anchor_history(repo, 0.1)
    assert bench._anchor_of(hist["q"]) == (0.9, 7, 1.0)


def test_history_reads_all_ratchet_entry_formats(bench, tmp_path):
    """bench_full.json's anchors map migrates in place: pre-r14
    entries are [sec, round] or [sec, round, ratio] (one sample);
    r14+ entries are LISTS of per-run samples."""
    repo = str(tmp_path)
    _write(tmp_path, "QUERY_HASHES.json", {
        "old2": {"round": 1}, "old3": {"round": 1}, "new": {"round": 1}})
    _write(tmp_path, "bench_full.json", {
        "sf": 0.1, "round": 2, "queries": {},
        "anchors": {
            "old2": [1.5, 2],
            "old3": [2.0, 3, 0.8],
            "new": [[1.0, 2, 1.0], [3.0, 3, 1.9], [1.2, 4, 0.9]],
        },
    })
    hist = bench._anchor_history(repo, 0.1)
    assert bench._anchor_of(hist["old2"]) == (1.5, 2, 1.0)
    assert bench._anchor_of(hist["old3"]) == (2.0, 3, 0.8)
    # median of {1.0, 1.2, 3.0} = 1.2; newest round 4
    assert bench._anchor_of(hist["new"]) == (1.2, 4, 0.9)


def test_merge_history_appends_and_caps(bench):
    hist = {"q": [[1.0, 2, 1.0]]}
    out = bench._merge_history(hist, {"q": 0.9}, 5, 0.7)
    assert out["q"] == [[1.0, 2, 1.0], [0.9, 5, 0.7]]
    # cap: only the newest _HISTORY_CAP rounds survive
    long = {"q": [[float(i), i, 1.0] for i in range(1, 12)]}
    capped = bench._merge_history(long, {"q": 0.5}, 12, 1.0)["q"]
    assert len(capped) == bench._HISTORY_CAP
    assert capped[-1] == [0.5, 12, 1.0]
    assert capped[0][1] == 12 - bench._HISTORY_CAP + 1


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
