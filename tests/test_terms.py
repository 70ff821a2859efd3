"""Terms-emission golden rows (pipeline/terms.py; reference analog
RdfBuilder.java:205-217 + RdfBuilderTest's golden-triple style)."""

from __future__ import annotations

from wikidata_sparql_history_spark.pipeline import terms


def _ranges(spark, *ents):
    rows = [("c0", e, "P0", e, 2, 9) for e in ents]
    return spark.createDataFrame(
        rows,
        "conv_id string, subj string, pred string, obj string, "
        "range_start long, range_end long",
    )


def test_entity_terms_golden(spark):
    # Q7: k=7 → label lang L[2]='zh-yue'→'yue'; 7%3=1 alias (j=0,
    # lang L[(7+0+1)%5=3]='als'→'gsw'); description always en.
    got = {
        (r["entity"], r["term_type"], r["text"], r["lang"], r["bcp47"])
        for r in terms.entity_terms(_ranges(spark, "Q7")).collect()
    }
    assert got == {
        ("Q7", "label", "entity 7", "zh-yue", "yue"),
        ("Q7", "description", "canonical entity 7", "en", "en"),
        ("Q7", "alias", "entity 7 alias 0", "als", "gsw"),
    }


def test_entity_terms_alias_counts(spark):
    # k % 3 aliases: Q3 → 0, Q4 → 1, Q5 → 2
    df = terms.entity_terms(_ranges(spark, "Q3", "Q4", "Q5"))
    counts = {
        r["entity"]: r["n"]
        for r in df.filter("term_type = 'alias'")
        .groupBy("entity")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert counts == {"Q4": 1, "Q5": 2}  # Q3 has zero alias rows


def test_property_scaffolding_golden(spark):
    rows = terms.property_scaffolding(_ranges(spark, "Q1")).collect()
    got = {(r["pred"], r["form"], r["iri"], r["owl_type"]) for r in rows}
    assert got == {
        ("P0", "directClaim", "wdt:P0", "owl:ObjectProperty"),
        ("P0", "claim", "p:P0", "owl:ObjectProperty"),
        ("P0", "statementProperty", "ps:P0", "owl:ObjectProperty"),
        ("P0", "qualifier", "pq:P0", "owl:ObjectProperty"),
        ("P0", "reference", "pr:P0", "owl:ObjectProperty"),
        ("P0", "novalue", "wdno:P0", "owl:Class"),
    }


def test_entity_terms_single_scan_single_exchange(spark, tmp_path):
    """The terms table must read the fact table ONCE and shuffle ONCE
    (the entity distinct) — the union-of-branches shape re-derived the
    entity set per term type (6 scans / 3 exchanges), which at 100 TB
    is five redundant fact-table passes. Plan-asserted."""
    path = str(tmp_path / "ranges")
    _ranges(spark, "Q1", "Q2").write.parquet(path)
    plan = (
        terms.entity_terms(spark.read.parquet(path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") == 1


def test_entity_terms_skips_non_entities(spark):
    # non-Q terms (unlinked surface forms, predicates) emit no terms
    df = terms.entity_terms(_ranges(spark, "E99", "Q1"))
    assert {r["entity"] for r in df.collect()} == {"Q1"}
