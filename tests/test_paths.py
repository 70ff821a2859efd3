"""Transitive closure (SPARQL p+ analog, PropertyPathOptimizer)."""

from __future__ import annotations

from wikidata_sparql_history_spark.plans import paths


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_closure_chain_unbounded(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {tuple(r) for r in paths.transitive_closure(e).collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }


def test_closure_cycle_terminates(spark):
    # 3-cycle: every node reaches every node including itself
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {tuple(r) for r in paths.transitive_closure(e).collect()}
    assert got == {(x, y) for x in "abc" for y in "abc"}


def test_closure_seeded(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    seeds = spark.createDataFrame([("a",)], "src string")
    got = {tuple(r) for r in paths.transitive_closure(e, seeds=seeds).collect()}
    assert got == {("a", "b"), ("a", "c")}


def test_closure_max_hops(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {tuple(r) for r in paths.transitive_closure(e, max_hops=2).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")}


def test_closure_self_loop(spark):
    e = _edges(spark, [("a", "a"), ("a", "b")])
    got = {tuple(r) for r in paths.transitive_closure(e).collect()}
    assert got == {("a", "a"), ("a", "b")}
