"""Fused pipeline ≡ composable stages, and exchange-count audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_sparql_history_spark import synth
from wikidata_sparql_history_spark.pipeline import (
    canonicalize,
    coalesce,
    extract,
    linking,
    ordering,
)
from wikidata_sparql_history_spark.pipeline.construct import construct_ranges

COLS = ["conv_id", "subj", "pred", "obj", "range_start", "range_end"]


def composable(spark, t):
    turns = ordering.ordered_turns(t)
    facts = extract.extract_triples(t)
    linked = linking.link_mentions(facts, synth.candidate_dict(spark))
    canon = canonicalize.canonicalize_triples(
        linked, synth.alias_edges(spark)
    ).dropDuplicates(["conv_id", "turn_idx", "subj", "pred", "obj"])
    return coalesce.coalesce_ranges(canon, turns)


def test_fused_equals_composable(spark):
    t = synth.transcripts(spark, 60)
    a = construct_ranges(
        spark, t, synth.candidate_dict(spark), synth.alias_edges(spark)
    )
    b = composable(spark, t)
    rows_a = sorted(tuple(r) for r in a.select(*COLS).collect())
    rows_b = sorted(tuple(r) for r in b.select(*COLS).collect())
    assert rows_a == rows_b
    assert len(rows_a) > 0
    # provenance timestamps also agree
    ts_a = sorted(tuple(r) for r in a.select(*COLS, "start_ts").collect())
    ts_b = sorted(tuple(r) for r in b.select(*COLS, "start_ts").collect())
    assert ts_a == ts_b


def test_builtin_variant_equals_pandas_variant(spark):
    t = synth.transcripts(spark, 60)
    a = construct_ranges(
        spark, t, synth.candidate_dict(spark), synth.alias_edges(spark)
    )
    b = construct_ranges(
        spark, t, synth.candidate_dict(spark), synth.alias_edges(spark),
        use_builtin_extractor=True,
    )
    rows_a = sorted(tuple(r) for r in a.select(*COLS, "start_ts").collect())
    rows_b = sorted(tuple(r) for r in b.select(*COLS, "start_ts").collect())
    assert rows_a == rows_b


def test_builtin_fused_plan_has_one_exchange(spark):
    """The all-JVM variant: Generate/Project preserve hash(conv_id),
    so the entire pipeline needs exactly one wide exchange."""
    t = synth.transcripts(spark, 20, shuffled=False)
    plan = construct_ranges(
        spark, t, synth.candidate_dict(spark), synth.alias_edges(spark),
        use_builtin_extractor=True,
    )._jdf.queryExecution().executedPlan().toString()
    n_shuffles = plan.count("Exchange hashpartitioning(conv_id")
    assert n_shuffles == 1, f"expected 1 conv_id exchange, got {n_shuffles}"


def test_fused_plan_has_two_exchanges(spark):
    t = synth.transcripts(spark, 20, shuffled=False)
    plan = construct_ranges(
        spark, t, synth.candidate_dict(spark), synth.alias_edges(spark)
    )._jdf.queryExecution().executedPlan().toString()
    # count shuffle exchanges over the fact stream (keyed by conv_id);
    # dictionary-side exchanges (100-row dims, keyed by mention) and
    # broadcast exchanges don't move the big data
    n_shuffles = plan.count("Exchange hashpartitioning(conv_id")
    assert n_shuffles <= 2, f"plan regressed to {n_shuffles} shuffles:\n{plan[:2000]}"
    # dedup agg, island window and final agg must NOT re-exchange:
    # everything between the 2nd conv_id exchange and the output is
    # exchange-free (subset-rule reuse)
    tail = plan.split("Exchange hashpartitioning(conv_id")[0]
    assert "Exchange hashpartitioning" not in tail
