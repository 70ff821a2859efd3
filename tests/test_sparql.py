"""SPARQL front-door tests (plans/sparql.py — SimpleQueryPreparer
analog): parser, BGP join evaluation, filters, error paths."""

from __future__ import annotations

import pytest

from wikidata_sparql_history_spark.plans import sparql


def graph(spark):
    return spark.createDataFrame(
        [
            ("Q7", "P0", "Q7"),    # self-loop
            ("Q7", "P1", "Q3"),
            ("Q3", "P2", "Q5"),
            ("Q3", "P2", "Q6"),
            ("Q9", "P1", "Q3"),
        ],
        "subj string, pred string, obj string",
    )


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_parse_select_and_limit():
    sel, pats, filts, order, limit = sparql.parse(
        "SELECT ?s ?o WHERE { ?s <P0> ?o . FILTER(?s = Q7) } "
        "ORDER BY ?s ?o DESC LIMIT 5"
    )
    assert sel == ["s", "o"]
    assert pats == [("?s", "P0", "?o")]
    assert filts == [("s", "Q7")]
    assert order == [("s", False), ("o", True)]
    assert limit == 5


def test_star_selects_all_vars_sorted(spark):
    out = sparql.evaluate(graph(spark), "SELECT * WHERE { ?s P1 ?o }")
    assert out.columns == ["o", "s"]
    assert rows(out) == {("Q3", "Q7"), ("Q3", "Q9")}


def test_bgp_join_on_shared_var(spark):
    q = "SELECT ?x ?y WHERE { Q7 ?p ?x . ?x P2 ?y }"
    assert rows(sparql.evaluate(graph(spark), q)) == {
        ("Q3", "Q5"), ("Q3", "Q6")
    }


def test_filter_equality(spark):
    q = "SELECT ?s WHERE { ?s P1 ?o . FILTER(?s = Q9) }"
    assert rows(sparql.evaluate(graph(spark), q)) == {("Q9",)}


def test_repeated_variable_matches_self_loops(spark):
    q = "SELECT ?x WHERE { ?x P0 ?x }"
    assert rows(sparql.evaluate(graph(spark), q)) == {("Q7",)}


def test_variable_predicate(spark):
    q = "SELECT ?p WHERE { Q3 ?p Q5 }"
    assert rows(sparql.evaluate(graph(spark), q)) == {("P2",)}


def test_unsupported_feature_raises(spark):
    with pytest.raises(sparql.SparqlError, match="OPTIONAL"):
        sparql.evaluate(
            graph(spark),
            "SELECT ?s WHERE { ?s P1 ?o . OPTIONAL { ?o P2 ?z } }",
        )


def test_unbound_filter_and_select_raise(spark):
    with pytest.raises(sparql.SparqlError, match="unbound"):
        sparql.evaluate(
            graph(spark), "SELECT ?s WHERE { ?s P1 ?o . FILTER(?z = Q1) }"
        )
    with pytest.raises(sparql.SparqlError, match="unbound"):
        sparql.evaluate(graph(spark), "SELECT ?z WHERE { ?s P1 ?o }")


def test_order_by_limit_topk(spark):
    # deterministic top-k: plans as TakeOrderedAndProject (O3)
    q = "SELECT ?s ?o WHERE { ?s P2 ?o } ORDER BY ?o DESC LIMIT 1"
    out = sparql.evaluate(graph(spark), q)
    assert [tuple(r) for r in out.collect()] == [("Q3", "Q6")]
    assert "TakeOrderedAndProject" in (
        out._jdf.queryExecution().executedPlan().toString()
    )
    with pytest.raises(sparql.SparqlError, match="ORDER BY"):
        sparql.evaluate(
            graph(spark), "SELECT ?s WHERE { ?s P2 ?o } ORDER BY ?o"
        )


def test_bad_pattern_raises(spark):
    with pytest.raises(sparql.SparqlError, match="bad triple pattern"):
        sparql.evaluate(graph(spark), "SELECT ?s WHERE { ?s P1 }")
