"""Property-based range-union merge test (hypothesis).

Random interval sets, arbitrarily split into two 'batches', must merge
back to the canonical disjoint union — the deep guarantee behind the
★merge_ranges_union / ★kg_incremental_rebuild contract queries
(LongRangeUtils.java:34-74 semantics).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wikidata_sparql_history_spark.streaming.incremental import merge_ranges

interval = st.tuples(
    st.integers(min_value=0, max_value=30), st.integers(min_value=1, max_value=12)
).map(lambda t: (t[0], t[0] + t[1]))

case = st.tuples(
    st.lists(interval, min_size=0, max_size=6),
    st.lists(interval, min_size=0, max_size=6),
).filter(lambda ab: len(ab[0]) + len(ab[1]) >= 1)


def py_union(intervals):
    """Pure-python oracle: canonical disjoint sorted union, merging
    overlapping AND adjacent ranges (half-open [start, end))."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


@settings(max_examples=25, deadline=None)
@given(case)
def test_merge_ranges_matches_python_union(spark, ab):
    a, b = ab
    schema = (
        "conv_id string, subj string, pred string, obj string, "
        "ranges array<struct<start:bigint,end:bigint>>"
    )

    def df(intervals):
        rows = [("c", "Q1", "P1", "Q2", sorted(intervals))] if intervals else []
        return spark.createDataFrame(rows, schema)

    merged = merge_ranges(df(a), df(b)).collect()
    assert len(merged) == 1
    got = [(r.start, r.end) for r in merged[0].ranges]
    assert got == py_union(a + b), (a, b)
