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


def test_merge_history_never_rebaselines_unacquitted_flags(bench):
    """ADVICE r14: with the 8-sample cap and a median anchor, appending
    a regression's slow sample unconditionally re-baselines the
    regression after ~4 runs and the flag silently disappears. Samples
    from unacquitted verdicts are dropped; acquitted flags contribute
    their CLEAN re-measure (host-tax -> isolated, position-tax ->
    fresh), not the transient that flagged them."""
    hist = {n: [[1.0, 2, 1.0]] for n in ("reg", "hs", "fcf", "ht", "pt", "ok")}
    timings = {n: 5.0 for n in hist}
    timings["ok"] = 1.1
    flagged = {
        "reg": {"verdict": "regression", "isolated": 4.8, "fresh": 4.9},
        "hs": {"verdict": "host-suspect", "isolated": 4.8, "fresh": 4.9},
        "fcf": {"verdict": "fresh-check-failed", "isolated": 4.8},
        "ht": {"verdict": "host-tax", "isolated": 0.9},
        "pt": {"verdict": "position-tax", "isolated": 4.8, "fresh": 1.05},
    }
    out = bench._merge_history(hist, timings, 6, 1.0, flagged=flagged)
    # unacquitted: the 5.0 sweep sample must not enter the history
    for n in ("reg", "hs", "fcf"):
        assert out[n] == [[1.0, 2, 1.0]], n
    # acquitted: the clean re-measure enters, not the 5.0 transient
    assert out["ht"][-1][0] == 0.9
    assert out["pt"][-1][0] == 1.05
    # unflagged queries append their sweep min as before
    assert out["ok"][-1][0] == 1.1


def test_run_canary_ratio_handles_missing_fields(bench):
    assert bench._run_canary_ratio({}) == 1.0
    assert bench._run_canary_ratio(
        {"canary": {"start_ratio": 0.8, "end_ratio": 1.2}}) == 1.0
    assert bench._run_canary_ratio(
        {"canary": {"start_ratio": 0.5}}) == 0.5


def test_freshcheck_parses_last_matching_json_line(bench, tmp_path):
    """_freshcheck must find its JSON line amid warmup noise on
    stdout, match the exact comma-joined batch, and return None (never
    raise) when the subprocess fails — a broken recheck degrades to
    'fresh-check-failed', not a dead bench."""
    fake = os.path.join(str(tmp_path), "bench.py")
    with open(fake, "w") as f:
        f.write(
            "import json, os\n"
            "names = os.environ['SPARK_GRAFT_BENCH_FRESHCHECK']\n"
            "print('warmup noise')\n"
            "print(json.dumps({'freshcheck': names,\n"
            " 'mins': {n: 0.5 for n in names.split(',')},\n"
            " 'canary_ratio': 1.1}))\n"
        )
    rec = bench._freshcheck(str(tmp_path), ["qx"], "/nonexistent")
    assert rec == {"freshcheck": "qx", "mins": {"qx": 0.5},
                   "canary_ratio": 1.1}
    rec = bench._freshcheck(str(tmp_path), ["qa", "qb"], "/nonexistent")
    assert rec["mins"] == {"qa": 0.5, "qb": 0.5}
    with open(fake, "w") as f:
        f.write("raise SystemExit(3)\n")
    assert bench._freshcheck(str(tmp_path), ["qx"], "/nonexistent") is None


def _mk_history(names, anchor=1.0):
    return {n: [[anchor, 2, 1.0], [anchor, 3, 1.0], [anchor, 4, 1.0]]
            for n in names}


def test_adjudicate_storm_leaves_no_unadjudicated(bench):
    """VERDICT r14 #6: a >batch-size flag storm must end with a real
    verdict on every flag — the old per-query budget of 4 fresh JVMs
    left 'unadjudicated' rows in graded artifacts. Batching gives
    ceil(N/batch) JVMs; every still-slow shared-batch query gets one
    dedicated JVM before any indicting verdict."""
    names = [f"q{i}" for i in range(9)]
    history = _mk_history(names)
    timings = {n: 5.0 for n in names}  # all >2x the 1.0 anchor
    batches = []

    def fake_fresh(chunk):
        batches.append(list(chunk))
        # q0..q6 come back clean in the batch; q7/q8 stay slow
        return {
            "freshcheck": ",".join(chunk),
            "mins": {n: (4.5 if n in ("q7", "q8") else 0.9) for n in chunk},
            "canary_ratio": 1.0 if "q8" not in chunk else 1.6,
        }

    flagged = bench._adjudicate(
        timings, history, 1.0, 1.0,
        lambda n: 4.9,           # isolated recheck never acquits
        fake_fresh, batch_size=4,
    )
    assert set(flagged) == set(names)
    verdicts = {n: flagged[n]["verdict"] for n in names}
    assert "unadjudicated" not in set(verdicts.values())
    for n in [f"q{i}" for i in range(7)]:
        assert verdicts[n] == "position-tax", n
    # q7: slow in a shared batch -> dedicated solo JVM (canary 1.0
    # there) -> regression; q8: lands in the tail chunk of one, so its
    # first fresh JVM is already untainted -> the 1.6 canary makes it
    # host-suspect with no extra spawn. Indicting verdicts only ever
    # rest on measurements no batch neighbor could have tainted.
    assert verdicts["q7"] == "regression"
    assert verdicts["q8"] == "host-suspect"
    shared = [b for b in batches if len(b) > 1]
    solos = [b for b in batches if len(b) == 1]
    assert len(shared) == 2  # [q0-q3], [q4-q7]; q8 is the tail chunk
    assert sorted(s[0] for s in solos) == ["q7", "q8"]


def test_adjudicate_rungs_and_failures(bench):
    """Rung order: isolated acquit -> host-tax without any JVM spawn;
    isolated error -> 'error'; a dead fresh subprocess ->
    'fresh-check-failed' (isolated-only information, never an
    indictment)."""
    history = _mk_history(["a", "b", "c"])
    timings = {"a": 5.0, "b": 5.0, "c": 5.0}
    spawned = []

    def fake_fresh(chunk):
        spawned.append(list(chunk))
        return None  # subprocess died

    flagged = bench._adjudicate(
        timings, history, 1.0, 1.0,
        lambda n: {"a": 0.8, "b": None, "c": 4.9}[n],
        fake_fresh, batch_size=4,
    )
    assert flagged["a"]["verdict"] == "host-tax"
    assert flagged["b"]["verdict"] == "error"
    assert flagged["c"]["verdict"] == "fresh-check-failed"
    assert spawned == [["c"]]  # host-tax/error never reach the JVM rung
