"""Property-based tests (hypothesis): invariants that golden cases
can't sweep — random-dim image roundtrips, GTID interval algebra."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dtle_spark.functions.multimodal import make_png, parse_image_header
from dtle_spark.sources.gtid import GtidSet

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 512), st.integers(1, 512))
def test_png_roundtrip_any_dims(w, h):
    assert parse_image_header(make_png(w, h)) == {
        "format": "png", "width": w, "height": h
    }


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 200), min_size=1, max_size=60))
def test_gtid_add_order_free_and_contains(gnos):
    fwd, rev = GtidSet(), GtidSet()
    for g in gnos:
        fwd.add(SID, g)
    for g in reversed(gnos):
        rev.add(SID, g)
    assert fwd.to_str() == rev.to_str()  # canonical form, order-free
    for g in gnos:
        assert fwd.contains(SID, g)
    missing = set(range(1, 201)) - set(gnos)
    for g in list(missing)[:10]:
        assert not fwd.contains(SID, g)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(1, 120), min_size=1, max_size=30),
    st.lists(st.integers(1, 120), min_size=1, max_size=30),
)
def test_gtid_union_is_set_union(a, b):
    sa, sb = GtidSet(), GtidSet()
    for g in a:
        sa.add(SID, g)
    for g in b:
        sb.add(SID, g)
    # union mutates the receiver; build it on a round-tripped copy so
    # the test also exercises to_str/from_str
    u = GtidSet.from_str(sa.to_str()).union(sb)
    for g in set(a) | set(b):
        assert u.contains(SID, g)
    assert u.contains_set(sb)
    assert u.contains_set(GtidSet.from_str(sa.to_str()))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 50), st.integers(0, 20)), min_size=1, max_size=20))
def test_gtid_intervals_canonical_and_disjoint(spans):
    s = GtidSet()
    for start, span in spans:
        s.add_interval(SID, start, start + span)
    ivs = s._intervals[SID]
    # canonical: sorted, non-overlapping, non-adjacent
    for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
        assert b1 + 1 < a2, ivs
    for a1, b1 in ivs:
        assert a1 <= b1


# --- binlog translator invariants over random event streams -----------

_tx_body = st.lists(
    st.one_of(
        st.tuples(st.just("insert"),
                  st.lists(st.integers(0, 99), min_size=1, max_size=4)),
        st.tuples(st.just("delete"),
                  st.lists(st.integers(0, 99), min_size=1, max_size=4)),
        st.tuples(st.just("update"),
                  st.lists(st.integers(0, 99), min_size=1, max_size=4)),
    ),
    min_size=0, max_size=5,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.booleans(), _tx_body), min_size=1, max_size=8),
       st.integers(0, 3))
def test_binlog_translator_invariants(txs, resume_upto):
    """For ANY stream of (committed?, rows...) transactions:
    - rows surface only at commit boundaries (uncommitted tails never)
    - wire seq is STRICTLY monotone across all emitted rows
    - txs <= resume position emit nothing (redelivery guard)
    - gtid_executed equals exactly the committed, non-skipped gnos."""
    from dtle_spark.sources.binlog_events import BinlogEventTranslator
    from dtle_spark.sources.gtid import GtidSet

    resume = GtidSet()
    for g in range(1, resume_upto + 1):
        resume.add(SID, g)
    tr = BinlogEventTranslator(resume_from=resume)
    out = []
    expected = []
    pos = 100
    for gno0, (commit, body) in enumerate(txs, start=1):
        tr_rows = tr.feed({"type": "gtid", "sid": SID, "gno": gno0,
                           "last_committed": 0, "sequence_number": gno0})
        assert tr_rows == []
        n_rows = 0
        for op, vals in body:
            pos += 10
            if op == "update":
                rows = [({"id": v, "x": 0}, {"id": v, "x": 1}) for v in vals]
            else:
                rows = [{"id": v, "x": 0} for v in vals]
            got = tr.feed({"type": "rows", "op": op, "schema": "db1",
                           "table": "t", "rows": rows, "log_pos": pos})
            assert got == []  # buffered until the commit boundary
            n_rows += len(rows)
        if commit:
            pos += 10
            got = tr.feed({"type": "xid", "xid": gno0, "log_pos": pos})
            if gno0 > resume_upto:
                assert len(got) == n_rows
                out.extend(got)
                expected.append(gno0)
            else:
                assert got == []  # redelivered tx skipped entirely
        # uncommitted: next GTID event drops the buffer (asserted via
        # the seq/emission invariants below)
    seqs = [r["seq"] for r in out]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    want = GtidSet()
    for g in range(1, resume_upto + 1):
        want.add(SID, g)
    for g in expected:
        want.add(SID, g)
    assert tr.gtid_executed.to_str() == want.to_str()
    assert all(r["sid"] == SID for r in out)
