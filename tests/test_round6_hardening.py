"""Round-6 hardening: PREFIX/BASE prologue, variable GRAPH names
(bounded boundary enumeration), compound FILTER expressions,
DESCRIBE ?x WHERE, the bound-subject p* zero-length fix, subquery
GRAPH-context threading, and type-correct UNION padding on the
encoded surface (round-5 verdict items 1-3/5-6 + advice)."""

from __future__ import annotations

import pytest

from wikidata_sparql_history_spark.plans import sparql
from tests.test_sparql import graph, ranges, turns, rows


# --- PREFIX / BASE prologue (SPARQL 1.1 §4.1.1) ---------------------------

def test_parse_headers_unit():
    body, prefixes, base = sparql.parse_headers(
        "PREFIX a: <http://a.example/> \n"
        "prefix b: <http://b.example/#>\n"
        "BASE <http://base.example/>\n"
        "PREFIX a: <http://a2.example/>\n"
        "SELECT ?s WHERE { ?s a:p ?o }"
    )
    assert body.strip().startswith("SELECT")
    # redefinition is last-wins, as in SPARQL
    assert prefixes == {"a": "http://a2.example/", "b": "http://b.example/#"}
    assert base == "http://base.example/"


def test_prefix_expansion_in_terms():
    q = sparql.parse(
        "PREFIX ex: <http://ex.org/> "
        'SELECT ?s WHERE { ?s ex:p "3"^^ex:dt . ?s ex:q ?o }'
    )
    p1, p2 = q.group
    assert p1.p == sparql.Iri("http://ex.org/p")
    assert p1.o.datatype == "http://ex.org/dt"
    assert p2.p == sparql.Iri("http://ex.org/q")


def test_base_resolves_relative_iris():
    q = sparql.parse(
        "BASE <http://base.example/> "
        "SELECT ?o WHERE { <rel/x> <http://abs.example/p> ?o }"
    )
    (pat,) = q.group
    assert pat.s == sparql.Iri("http://base.example/rel/x")
    # absolute IRIs (scheme present) are never BASE-resolved
    assert pat.p == sparql.Iri("http://abs.example/p")


def test_undeclared_prefix_keeps_bare_name(spark):
    # rev:global/5 with no PREFIX header: current bare-name behavior
    r = ranges(spark)
    q = "SELECT ?s ?o WHERE { GRAPH rev:global/5 { ?s P0 ?o } }"
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("Q1", "Q3"), ("Q9", "Q1")
    }


def test_prefix_expanded_graph_iri(spark):
    # the full REVISION_NAMESPACE form via a declared prefix
    # (Vocabulary.java:51; prefixes.json registry)
    r = ranges(spark)
    q = (
        "PREFIX revs: <http://www.wikidata.org/revision/> "
        "SELECT ?s ?o WHERE { GRAPH revs:global/5 { ?s P0 ?o } }"
    )
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("Q1", "Q3"), ("Q9", "Q1")
    }


def test_prefix_expanded_magic_predicates(spark):
    # schema.org / wikiba.se history namespaces expand to full IRIs
    # and still dispatch to the metadata views (Vocabulary.java:20-35)
    t = turns(spark)
    q = (
        "PREFIX schema: <http://schema.org/> "
        "PREFIX hist: <http://wikiba.se/history/ontology#> "
        "SELECT ?t ?who ?c WHERE "
        "{ ?t hist:author ?who . ?t schema:about ?c }"
    )
    assert rows(sparql.evaluate(None, q, turns=t)) == {
        ("rev:c1/1", "user", "c1"), ("rev:c1/3", "assistant", "c1")
    }


def test_prefix_expanded_global_state_at(spark):
    t = turns(spark)
    q = (
        "PREFIX hist: <http://wikiba.se/history/ontology#> "
        'SELECT ?t WHERE { ?t hist:globalStateAt '
        '"2024-01-01T00:00:05"^^xsd:dateTime }'
    )
    assert rows(sparql.evaluate(None, q, turns=t)) == {("rev:c1/3",)}


# --- variable GRAPH names (bounded enumeration) ---------------------------

def test_graph_var_enumerates_boundaries(spark):
    # "at which revisions was this fact added / deleted?" in pure text
    # (the reference's unbound-context UnionIteration,
    # RocksTripleSource.java:96-104)
    r = ranges(spark)
    q = "SELECT ?g ?o WHERE { GRAPH ?g { Q1 P0 ?o } }"
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("rev:additions/0", "Q2"),
        ("rev:additions/5", "Q3"),
        ("rev:deletions/5", "Q2"),   # range_end = LONG_MAX is not an event
    }


def test_graph_var_join_same_context(spark):
    # two patterns under ONE GRAPH ?g must co-occur in the same
    # context (join on the bound graph variable)
    r = ranges(spark)
    q = "SELECT ?g WHERE { GRAPH ?g { Q1 P0 Q3 . Q9 P0 Q1 } }"
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("rev:additions/5",)
    }


def test_graph_var_projects_graph_only(spark):
    r = ranges(spark)
    q = "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s P1 ?o } }"
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("rev:additions/2",), ("rev:deletions/7",)
    }


# --- compound FILTER expressions ------------------------------------------

def test_filter_or(spark):
    g = graph(spark)
    q = ("SELECT ?s ?p ?o WHERE { ?s ?p ?o . "
         "FILTER(?p = P1 || ?p = P2) }")
    assert rows(sparql.evaluate(g, q)) == {
        ("Q7", "P1", "Q3"), ("Q3", "P2", "Q5"),
        ("Q3", "P2", "Q6"), ("Q9", "P1", "Q3"),
    }


def test_filter_and_with_parens(spark):
    g = graph(spark)
    q = ("SELECT ?s ?p ?o WHERE { ?s ?p ?o . "
         "FILTER((?p = P0 || ?p = P1) && ?s = Q7) }")
    assert rows(sparql.evaluate(g, q)) == {
        ("Q7", "P0", "Q7"), ("Q7", "P1", "Q3"),
    }


def test_filter_var_var_comparison(spark):
    g = graph(spark)
    q = "SELECT ?s ?o WHERE { ?s ?p ?o . FILTER(?s = ?o) }"
    assert rows(sparql.evaluate(g, q)) == {("Q7", "Q7")}
    q2 = ("SELECT ?s ?p ?o WHERE { ?s ?p ?o . "
          "FILTER(?s != ?o && ?p != P2) }")
    assert rows(sparql.evaluate(g, q2)) == {
        ("Q7", "P1", "Q3"), ("Q9", "P1", "Q3"),
    }


def test_filter_regex_inside_boolean(spark):
    g = graph(spark)
    q = ('SELECT ?s ?o WHERE { ?s P2 ?o . '
         'FILTER(regex(?o, "5$") || regex(?o, "6$")) }')
    assert rows(sparql.evaluate(g, q)) == {("Q3", "Q5"), ("Q3", "Q6")}


def test_filter_unbound_var_in_boolean_raises(spark):
    g = graph(spark)
    with pytest.raises(sparql.SparqlError, match="unbound"):
        sparql.evaluate(
            g, "SELECT ?s WHERE { ?s P0 ?o . FILTER(?s = ?zzz || ?s = Q7) }"
        ).collect()


# --- DESCRIBE ?x WHERE -----------------------------------------------------

def test_describe_where_variable(spark):
    g = graph(spark)
    out = sparql.evaluate(g, "DESCRIBE ?x WHERE { ?x P2 ?o }")
    assert set(out.columns) == {"subj", "pred", "obj"}
    assert rows(out) == {
        ("Q7", "P1", "Q3"), ("Q3", "P2", "Q5"),
        ("Q3", "P2", "Q6"), ("Q9", "P1", "Q3"),
    }


def test_describe_where_errors(spark):
    g = graph(spark)
    with pytest.raises(sparql.SparqlError, match="WHERE clause"):
        sparql.evaluate(g, "DESCRIBE ?x")
    with pytest.raises(sparql.SparqlError, match="does not bind"):
        sparql.evaluate(g, "DESCRIBE ?x WHERE { ?y P2 ?o }")
    with pytest.raises(sparql.SparqlError, match="does not take"):
        sparql.evaluate(g, "DESCRIBE Q7 WHERE { ?y P2 ?o }")


# --- bound-subject p* zero-length solution (round-5 advice) ----------------

def test_path_star_bound_subject_absent_from_graph(spark):
    # SPARQL ZeroOrMorePath: <s> p* ?o yields (s, s) even when s has
    # no edges — previously lost because the seed derived from the
    # (filtered) graph
    g = graph(spark)
    out = sparql.evaluate(g, "SELECT ?o WHERE { Q99 P0* ?o }")
    assert rows(out) == {("Q99",)}
    # p+ of an absent subject is genuinely empty (≥1 edge required)
    out2 = sparql.evaluate(g, "SELECT ?o WHERE { Q99 P0+ ?o }")
    assert rows(out2) == set()


def test_path_star_bound_subject_present(spark):
    g = graph(spark)
    out = sparql.evaluate(g, "SELECT ?o WHERE { Q7 P1* ?o }")
    assert rows(out) == {("Q7",), ("Q3",)}


# --- subquery under GRAPH threads the context (round-5 advice) -------------

def test_subquery_inherits_graph_context(spark):
    r = ranges(spark)
    # default graph = the FULL history (what cli.run_query supplies);
    # the subquery sits inside GRAPH rev:global/6 and must count only
    # the snapshot (Q1: 1 live P0 fact at rev 6, not 2 historical)
    triples = r.select("subj", "pred", "obj")
    q = (
        "SELECT ?s ?n ?x WHERE { GRAPH rev:global/6 { "
        "{ SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s P0 ?o } GROUP BY ?s } "
        "?s P0 ?x } }"
    )
    out = sparql.evaluate(triples, q, ranges=r)
    assert rows(out) == {("Q1", 1, "Q3"), ("Q9", 1, "Q1")}


# --- UNION pad type on the encoded surface (round-5 verdict item 5) --------

def test_union_null_pad_is_long_under_encode_const(spark):
    enc = {"P1": 10, "P2": 11, "A": 1, "B": 2, "C": 3, "D": 4}
    g = spark.createDataFrame(
        [(1, 10, 2), (3, 11, 4)], "subj long, pred long, obj long"
    )

    def encode(term):
        return enc[sparql.string_form(term)]

    out = sparql.evaluate(
        g,
        "SELECT ?a ?b WHERE { { ?a P1 ?x } UNION { ?x P2 ?b } }",
        encode_const=encode,
    )
    assert dict(out.dtypes) == {"a": "bigint", "b": "bigint"}
    assert rows(out) == {(1, None), (None, 4)}


# --- broadcast guard trusts only exact stats (round-5 advice) --------------

def test_plan_row_bound_exact_or_none(spark, tmp_path):
    from wikidata_sparql_history_spark.operators import similarity as sim

    # Range relation: Catalyst knows the exact rowCount
    assert sim._plan_row_bound(spark.range(7)) == 7
    # parquet scan without CBO stats: rowCount undefined — must return
    # None (the old sizeInBytes//8 guess under-bounds on compressed
    # data and would skip the broadcast guard), forcing the capped
    # count-job fallback
    p = str(tmp_path / "t.parquet")
    spark.range(1000).selectExpr("id", "'x' AS pad").write.parquet(p)
    assert sim._plan_row_bound(spark.read.parquet(p)) is None


def test_cosine_topk_guard_still_raises(spark):
    from pyspark.sql import functions as F
    from wikidata_sparql_history_spark.operators import similarity as sim

    emb = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(1), F.rand(2)).alias("embedding"),
    )
    q = spark.range(30).select(
        F.col("id").alias("qid"),
        F.array(F.rand(3), F.rand(4)).alias("qvec"),
    )
    with pytest.raises(ValueError, match="query side"):
        sim.cosine_topk(emb, q, k=2, max_queries=10)


# --- FILTER function subset (BOUND / CONTAINS / STRSTARTS / STRENDS / !) ---

def test_filter_bound_after_optional(spark):
    g = graph(spark)
    # subjects of P1 whose object has NO outgoing P2 edge:
    # OPTIONAL + !BOUND — the SPARQL-1.1 negation idiom RDF4J serves
    q = ("SELECT ?s ?x WHERE { ?s P1 ?x . "
         "OPTIONAL { ?x P2 ?y } . FILTER(!BOUND(?y)) }")
    assert rows(sparql.evaluate(g, q)) == set()
    q2 = ("SELECT DISTINCT ?s ?x WHERE { ?s P0 ?x . "
          "OPTIONAL { ?x P2 ?y } . FILTER(!BOUND(?y)) }")
    # Q7 P0 Q7: Q7 has no P2 edge → survives
    assert rows(sparql.evaluate(g, q2)) == {("Q7", "Q7")}
    q3 = ("SELECT DISTINCT ?s WHERE { ?s P1 ?x . "
          "OPTIONAL { ?x P2 ?y } . FILTER(BOUND(?y)) }")
    assert rows(sparql.evaluate(g, q3)) == {("Q7",), ("Q9",)}


def test_filter_string_functions(spark):
    g = graph(spark)
    q = ('SELECT DISTINCT ?o WHERE { ?s P2 ?o . FILTER(STRENDS(?o, "5")) }')
    assert rows(sparql.evaluate(g, q)) == {("Q5",)}
    q2 = ('SELECT DISTINCT ?s WHERE { ?s ?p ?o . '
          'FILTER(STRSTARTS(?s, "Q") && CONTAINS(?s, "9")) }')
    assert rows(sparql.evaluate(g, q2)) == {("Q9",)}
    q3 = ('SELECT DISTINCT ?s ?o WHERE { ?s P2 ?o . '
          'FILTER(!CONTAINS(?o, "5")) }')
    assert rows(sparql.evaluate(g, q3)) == {("Q3", "Q6")}


def test_filter_not_composes(spark):
    g = graph(spark)
    q = ("SELECT DISTINCT ?s ?p ?o WHERE { ?s ?p ?o . "
         "FILTER(!(?p = P1 || ?p = P2)) }")
    assert rows(sparql.evaluate(g, q)) == {("Q7", "P0", "Q7")}


# --- arithmetic inside FILTER ----------------------------------------------

def test_filter_arithmetic(spark):
    t = turns(spark)
    q = ("SELECT ?t WHERE { ?t hist:revisionId ?r . "
         "FILTER(?r * 2 >= 6) }")
    assert rows(sparql.evaluate(None, q, turns=t)) == {("rev:c1/3",)}
    q2 = ("SELECT ?t WHERE { ?t hist:revisionId ?r . "
          "FILTER(?r + 2 = 3) }")
    assert rows(sparql.evaluate(None, q2, turns=t)) == {("rev:c1/1",)}


def test_filter_arithmetic_var_rhs(spark):
    t = turns(spark)
    # ?r - 2 = ?p: turn 3 has parent 1 → 3-2=1 matches
    q = ("SELECT ?t WHERE { ?t hist:revisionId ?r . "
         "?t schema:isBasedOn ?p0 . ?p0 hist:revisionId ?p . "
         "FILTER(?r - 2 = ?p) }")
    assert rows(sparql.evaluate(None, q, turns=t)) == {("rev:c1/3",)}


def test_filter_arithmetic_rejected_on_encoded(spark):
    g = spark.createDataFrame([(1, 10, 2)], "subj long, pred long, obj long")
    with pytest.raises(sparql.SparqlError, match="encoded surface"):
        sparql.evaluate(
            g, "SELECT ?o WHERE { ?s P1 ?o . FILTER(?o * 2 > 2) }",
            encode_const=lambda t: 10,
        ).collect()


def test_filter_arithmetic_parse_errors():
    with pytest.raises(sparql.SparqlError, match="numeric constant"):
        sparql.parse("SELECT ?s WHERE { ?s P0 ?o . FILTER(?o * x > 2) }")


# --- FROM dataset clause ---------------------------------------------------

def test_from_single_graph(spark):
    r = ranges(spark)
    q = "SELECT DISTINCT ?s ?o FROM <rev:global/5> WHERE { ?s P0 ?o }"
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("Q1", "Q3"), ("Q9", "Q1")
    }


def test_from_merges_multiple_graphs(spark):
    r = ranges(spark)
    q = ("SELECT DISTINCT ?s ?o FROM rev:additions/5 FROM rev:deletions/5 "
         "WHERE { ?s P0 ?o }")
    assert rows(sparql.evaluate(None, q, ranges=r)) == {
        ("Q1", "Q3"), ("Q9", "Q1"), ("Q1", "Q2")
    }


def test_from_errors(spark):
    r = ranges(spark)
    with pytest.raises(sparql.SparqlError, match="FROM NAMED"):
        sparql.parse("SELECT ?s FROM NAMED <rev:global/5> WHERE { ?s P0 ?o }")
    with pytest.raises(sparql.SparqlError, match="top-level"):
        sparql.parse(
            "SELECT ?s WHERE { { SELECT ?s FROM <rev:global/5> "
            "WHERE { ?s P0 ?o } } }")
    with pytest.raises(sparql.SparqlError, match="unknown graph IRI"):
        sparql.parse("SELECT ?s FROM <http://ex.org/g> WHERE { ?s P0 ?o }")


# --- SAMPLE / GROUP_CONCAT in query text -----------------------------------

def test_group_concat_and_sample(spark):
    g = graph(spark)
    q = ('SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=",") AS ?os) '
         "(SAMPLE(?o) AS ?first) WHERE { ?s P2 ?o } GROUP BY ?s")
    assert rows(sparql.evaluate(g, q)) == {("Q3", "Q5,Q6", "Q5")}


def test_group_concat_default_separator(spark):
    g = graph(spark)
    q = ("SELECT ?s (GROUP_CONCAT(?o) AS ?os) WHERE { ?s P2 ?o } "
         "GROUP BY ?s")
    assert rows(sparql.evaluate(g, q)) == {("Q3", "Q5 Q6")}


def test_separator_only_for_group_concat():
    with pytest.raises(sparql.SparqlError, match="only valid in GROUP_CONCAT"):
        sparql.parse(
            'SELECT (SUM(?o; SEPARATOR=",") AS ?x) WHERE { ?s P0 ?o }')


# --- IN / NOT IN membership filters ----------------------------------------

def test_filter_in_and_not_in(spark):
    g = graph(spark)
    q = "SELECT DISTINCT ?s WHERE { ?s ?p ?o . FILTER(?s IN (Q7, Q9)) }"
    assert rows(sparql.evaluate(g, q)) == {("Q7",), ("Q9",)}
    q2 = ("SELECT DISTINCT ?s WHERE { ?s ?p ?o . "
          "FILTER(?s NOT IN (Q7, Q9)) }")
    assert rows(sparql.evaluate(g, q2)) == {("Q3",)}
    # composes inside boolean expressions
    q3 = ("SELECT DISTINCT ?s ?o WHERE { ?s ?p ?o . "
          'FILTER(?s IN (Q3) && STRENDS(?o, "6")) }')
    assert rows(sparql.evaluate(g, q3)) == {("Q3", "Q6")}


def test_filter_in_encoded_surface(spark):
    enc = {"P1": 10, "A": 1, "B": 2}
    g = spark.createDataFrame(
        [(1, 10, 2), (2, 10, 1)], "subj long, pred long, obj long"
    )
    out = sparql.evaluate(
        g, "SELECT ?s WHERE { ?s P1 ?o . FILTER(?s IN (A)) }",
        encode_const=lambda t: enc[sparql.string_form(t)],
    )
    assert rows(out) == {(1,)}


def test_filter_in_parse_errors():
    with pytest.raises(sparql.SparqlError, match="constant terms"):
        sparql.parse("SELECT ?s WHERE { ?s P0 ?o . FILTER(?s IN (?x)) }")


# --- compound FILTER pushdown reaches the parquet scan ---------------------

def test_compound_filter_pushes_to_scan(spark, tmp_path):
    p = str(tmp_path / "r6_pushdown")
    graph(spark).write.parquet(p)
    df = spark.read.parquet(p)
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = (
            sparql.evaluate(
                df,
                "SELECT DISTINCT ?s ?o WHERE { ?s ?p ?o . "
                "FILTER(?p = P1 || ?p = P2) . FILTER(?s IN (Q3, Q9)) }",
            )._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    scan = plan.split("FileScan parquet")[1]
    pushed = scan.split("PushedFilters:")[1].splitlines()[0]
    assert "Or(EqualTo(pred,P1),EqualTo(pred,P2))" in pushed, pushed
    assert "In(subj, [Q3,Q9])" in pushed, pushed


# --- STR() / LANG() over the lex@lang convention ---------------------------

def test_filter_lang_and_str(spark):
    g = spark.createDataFrame(
        [
            ("Q1", "rdfs:label", "hello@en"),
            ("Q1", "rdfs:label", "bonjour@fr"),
            ("Q1", "rdfs:label", "plain"),
        ],
        "subj string, pred string, obj string",
    )
    q = ('SELECT ?o WHERE { Q1 rdfs:label ?o . FILTER(LANG(?o) = "en") }')
    assert rows(sparql.evaluate(g, q)) == {("hello@en",)}
    # SPARQL: LANG of a plain literal is ""
    q2 = ('SELECT ?o WHERE { Q1 rdfs:label ?o . FILTER(LANG(?o) = "") }')
    assert rows(sparql.evaluate(g, q2)) == {("plain",)}
    q3 = ('SELECT ?o WHERE { Q1 rdfs:label ?o . '
          'FILTER(STR(?o) = "bonjour") }')
    assert rows(sparql.evaluate(g, q3)) == {("bonjour@fr",)}
    # composes: non-English tagged labels
    q4 = ('SELECT ?o WHERE { Q1 rdfs:label ?o . '
          'FILTER(LANG(?o) != "en" && LANG(?o) != "") }')
    assert rows(sparql.evaluate(g, q4)) == {("bonjour@fr",)}


def test_filter_lang_rejected_on_encoded(spark):
    g = spark.createDataFrame([(1, 10, 2)], "subj long, pred long, obj long")
    with pytest.raises(sparql.SparqlError, match="encoded surface"):
        sparql.evaluate(
            g, 'SELECT ?o WHERE { ?s P1 ?o . FILTER(LANG(?o) = "en") }',
            encode_const=lambda t: 10,
        ).collect()


# --- syntax compatibility: `a`, ORDER BY DESC(?v), blank nodes -------------

def test_a_is_rdf_type_shorthand(spark):
    g = spark.createDataFrame(
        [("Q1", "rdf:type", "kg:Entity"), ("Q2", "P0", "Q1")],
        "subj string, pred string, obj string",
    )
    q = "SELECT ?s WHERE { ?s a kg:Entity }"
    assert rows(sparql.evaluate(g, q)) == {("Q1",)}
    # also inside property paths (a/P0 sequences parse)
    assert sparql.parse("SELECT ?s WHERE { ?s a ?t }").group[0].p == \
        sparql.Iri("rdf:type")


def test_order_by_function_form():
    q = sparql.parse(
        "SELECT ?s ?n WHERE { ?s P0 ?n } ORDER BY DESC(?n) ASC(?s)")
    assert q.order == [("n", True), ("s", False)]
    # postfix form still accepted
    q2 = sparql.parse("SELECT ?s WHERE { ?s P0 ?o } ORDER BY ?s DESC")
    assert q2.order == [("s", True)]


def test_blank_node_label_acts_as_variable(spark):
    g = graph(spark)
    # _:x joins across its two occurrences like a variable:
    # ?s P1 _:x . _:x P2 ?o — the classic bridge pattern
    q = "SELECT DISTINCT ?s ?o WHERE { ?s P1 _:x . _:x P2 ?o }"
    assert rows(sparql.evaluate(g, q)) == {
        ("Q7", "Q5"), ("Q7", "Q6"), ("Q9", "Q5"), ("Q9", "Q6"),
    }


def test_langmatches_basic_ranges(spark):
    g = spark.createDataFrame(
        [
            ("Q1", "rdfs:label", "hello@en"),
            ("Q1", "rdfs:label", "howdy@en-US"),
            ("Q1", "rdfs:label", "bonjour@fr"),
            ("Q1", "rdfs:label", "plain"),
        ],
        "subj string, pred string, obj string",
    )
    q = ('SELECT ?o WHERE { Q1 rdfs:label ?o . '
         'FILTER(LANGMATCHES(LANG(?o), "en")) }')
    assert rows(sparql.evaluate(g, q)) == {("hello@en",), ("howdy@en-US",)}
    q2 = ('SELECT ?o WHERE { Q1 rdfs:label ?o . '
          'FILTER(LANGMATCHES(LANG(?o), "*")) }')
    assert rows(sparql.evaluate(g, q2)) == {
        ("hello@en",), ("howdy@en-US",), ("bonjour@fr",)
    }


# --- OPTIONAL filters referencing outer variables (LeftJoin condition) -----

def test_optional_filter_outer_var_left_join_condition(spark):
    g = spark.createDataFrame(
        [
            ("s1", "P0", "o1"),
            ("o1", "P1", "s1"),     # filtered out by ?z != ?s
            ("o1", "P1", "z2"),     # survives
            ("s2", "P0", "o2"),
            ("o2", "P1", "s2"),     # the ONLY match — filtered, so
                                    # the s2 row must NULL-extend
        ],
        "subj string, pred string, obj string",
    )
    q = ("SELECT ?s ?o ?z WHERE { ?s P0 ?o . "
         "OPTIONAL { ?o P1 ?z . FILTER(?z != ?s) } }")
    assert rows(sparql.evaluate(g, q)) == {
        ("s1", "o1", "z2"), ("s2", "o2", None),
    }


def test_optional_filter_inner_only_still_post_filters(spark):
    # a filter on inner-only vars stays inside the optional group
    # (unchanged semantics)
    g = graph(spark)
    q = ("SELECT DISTINCT ?s ?o ?z WHERE { ?s P1 ?o . "
         'OPTIONAL { ?o P2 ?z . FILTER(STRENDS(?z, "5")) } }')
    assert rows(sparql.evaluate(g, q)) == {
        ("Q7", "Q3", "Q5"), ("Q9", "Q3", "Q5"),
    }


def test_optional_filter_outer_var_boolean_mix(spark):
    g = spark.createDataFrame(
        [
            ("s1", "P0", "o1"),
            ("o1", "P1", "a"), ("o1", "P1", "s1"),
        ],
        "subj string, pred string, obj string",
    )
    q = ("SELECT ?s ?z WHERE { ?s P0 ?o . "
         'OPTIONAL { ?o P1 ?z . FILTER(?z = ?s || ?z = "a") } }')
    assert rows(sparql.evaluate(g, q)) == {("s1", "a"), ("s1", "s1")}


def test_optional_filter_truly_unbound_still_raises(spark):
    g = graph(spark)
    with pytest.raises(sparql.SparqlError, match="unbound"):
        sparql.evaluate(
            g, "SELECT ?s WHERE { ?s P0 ?o . "
               "OPTIONAL { ?o P1 ?z . FILTER(?z != ?nowhere) } }"
        ).collect()


def test_having_group_concat_rejected(spark):
    g = graph(spark)
    with pytest.raises(sparql.SparqlError, match="GROUP_CONCAT numerically"):
        sparql.evaluate(
            g, "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s P2 ?o } "
               "GROUP BY ?s HAVING(GROUP_CONCAT(?o) > 1)")


def test_construct_where_shorthand(spark):
    g = graph(spark)
    out = sparql.evaluate(g, "CONSTRUCT WHERE { ?s P2 ?o }")
    assert set(out.columns) == {"subj", "pred", "obj"}
    assert rows(out) == {("Q3", "P2", "Q5"), ("Q3", "P2", "Q6")}
    out2 = sparql.evaluate(g, "CONSTRUCT WHERE { ?s P1 ?o . ?o P2 ?z } LIMIT 10")
    assert rows(out2) <= {
        ("Q7", "P1", "Q3"), ("Q9", "P1", "Q3"),
        ("Q3", "P2", "Q5"), ("Q3", "P2", "Q6"),
    }
    with pytest.raises(sparql.SparqlError, match="shorthand"):
        sparql.parse("CONSTRUCT WHERE { ?s P1 ?o . FILTER(?s = Q7) }")
    with pytest.raises(sparql.SparqlError, match="property paths"):
        sparql.parse("CONSTRUCT WHERE { ?s P1+ ?o }")
