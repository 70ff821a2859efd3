"""Triple-pattern × temporal-context matrix (FIXTURES.md §3).

Port of RocksTripleSourceTest.java:83-135: 4 triples of one subject,
each with ranges [42,43); assert result counts for all 8
bound/unbound (s,p,o) combinations under contexts: none,
additions@42, global-state@42 (hit), global-state@43 (miss),
deletions@43 — over both the range-row form and the packed
array form of the triples table.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from wikidata_sparql_history_spark.plans import views

# the reference test's four triples: (s, p, o) with range [42, 43)
TRIPLES = [
    ("Q1", "P1", "Q2"),
    ("Q1", "P1", "Q3"),
    ("Q1", "P2", "Q2"),
    ("Q1", "P2", "Q42"),
]


@pytest.fixture(scope="module")
def tables(spark):
    ranges = spark.createDataFrame(
        [("conv0", s, p, o, 42, 43) for s, p, o in TRIPLES],
        "conv_id string, subj string, pred string, obj string, "
        "range_start long, range_end long",
    )
    arrays = spark.createDataFrame(
        [("conv0", s, p, o, [(42, 43)]) for s, p, o in TRIPLES],
        "conv_id string, subj string, pred string, obj string, "
        "ranges array<struct<start:long, end:long>>",
    )
    return ranges, arrays


def pattern_count(df, s=None, p=None, o=None) -> int:
    if s is not None:
        df = df.filter(F.col("subj") == s)
    if p is not None:
        df = df.filter(F.col("pred") == p)
    if o is not None:
        df = df.filter(F.col("obj") == o)
    return df.count()


def expected_count(s, p, o) -> int:
    return sum(
        (s is None or ts == s) and (p is None or tp == p) and (o is None or to == o)
        for ts, tp, to in TRIPLES
    )


BINDINGS = list(
    itertools.product(["Q1", None], ["P1", None], ["Q2", None])
)  # all 8 combos, matching the reference's bound values


@pytest.mark.parametrize("s,p,o", BINDINGS)
def test_no_context(tables, s, p, o):
    ranges, _ = tables
    assert pattern_count(ranges, s, p, o) == expected_count(s, p, o)


@pytest.mark.parametrize("form", ["rows", "arrays"])
@pytest.mark.parametrize("s,p,o", BINDINGS)
def test_contexts(tables, form, s, p, o):
    ranges, arrays = tables
    if form == "rows":
        mk_state = lambda r: views.state_at(ranges, r)
        mk_add = lambda r: views.additions_at(ranges, r)
        mk_del = lambda r: views.deletions_at(ranges, r)
    else:
        mk_state = lambda r: views.state_at_arrays(arrays, r)
        mk_add = lambda r: views.additions_at_arrays(arrays, r)
        mk_del = lambda r: views.deletions_at_arrays(arrays, r)

    n = expected_count(s, p, o)
    # additions@42: every triple added there
    assert pattern_count(mk_add(42), s, p, o) == n
    # additions@43: none
    assert pattern_count(mk_add(43), s, p, o) == 0
    # global state@42: live (hit)
    assert pattern_count(mk_state(42), s, p, o) == n
    # global state@43: already deleted (miss)
    assert pattern_count(mk_state(43), s, p, o) == 0
    # deletions@43: all deleted there
    assert pattern_count(mk_del(43), s, p, o) == n
    # deletions@42: none
    assert pattern_count(mk_del(42), s, p, o) == 0


@pytest.mark.parametrize("s,p,o", BINDINGS)
def test_get_statements_front_door(tables, s, p, o):
    """getStatements(s,p,o,context) dispatch — one API, all 8 combos ×
    all 4 contexts (RocksTripleSource.java:91-181)."""
    from wikidata_sparql_history_spark.plans import statements

    ranges, _ = tables
    n = expected_count(s, p, o)
    gs = lambda ctx: statements.get_statements(ranges, s, p, o, context=ctx)
    assert gs(None).count() == n
    assert gs(("state", 42)).count() == n
    assert gs(("state", 43)).count() == 0
    assert gs(("additions", 42)).count() == n
    assert gs(("deletions", 43)).count() == n
    with pytest.raises(ValueError):
        gs(("bogus", 1)).count()
