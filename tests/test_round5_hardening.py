"""Round-5 hardening: edit-distance hot-block cap (round-4 verdict
item 5 / advice on degenerate blocks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_sparql_history_spark.operators import dedup


def test_edit_distance_hot_block_capped(spark):
    # 1200 docs opening with the SAME 40+ normalized chars (template
    # boilerplate) — uncapped this is a ~719k-pair quadratic block
    boiler = "this is the standard header sentence used by every page "
    rows = [(i, boiler + f"unique tail number {i}") for i in range(1200)]
    # plus a small genuine near-dup block under a different prefix
    rows += [
        (2000, "a completely different opening line with a tail x"),
        (2001, "a completely different opening line with a tail y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = dedup.edit_distance_pairs(docs, max_dist=20)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    # the hot block is dropped entirely; the small block survives
    assert got == {(2000, 2001)}

    hot = dedup.edit_distance_hot_blocks(docs)
    hot_rows = hot.collect()
    assert len(hot_rows) == 1 and hot_rows[0]["count"] == 1200
    assert hot_rows[0]["blk"].startswith("this is the standard")

    # candidate volume is bounded BEFORE Levenshtein: the join input
    # excludes the 1200 hot-block rows
    capped = dedup._edit_blocks(docs, 40).join(
        F.broadcast(hot.select("blk")), "blk", "left_anti"
    )
    assert capped.count() == 2


def test_edit_distance_empty_normalized_text_no_block(spark):
    # all-punctuation docs normalize to '' — must NOT collapse into
    # one shared block (advice: degenerate-block caveat)
    shared = "a real opening long enough to fill the forty char block "
    docs = spark.createDataFrame(
        [(1, "!!! ???"), (2, "### $$$"), (3, "..."),
         (4, shared + "tail one"), (5, shared + "tail two")],
        "doc_id long, text string",
    )
    pairs = dedup.edit_distance_pairs(docs, max_dist=8)
    assert {(r.id1, r.id2) for r in pairs.collect()} == {(4, 5)}


def test_edit_distance_cap_disabled_restores_block(spark):
    docs = spark.createDataFrame(
        [(i, "same prefix all the way through the block limit "
             f"tail {i}") for i in range(5)],
        "doc_id long, text string",
    )
    n = dedup.edit_distance_pairs(
        docs, max_dist=50, max_block_size=3
    ).count()
    assert n == 0  # block of 5 > cap 3 ⇒ dropped
    n2 = dedup.edit_distance_pairs(
        docs, max_dist=50, max_block_size=None
    ).count()
    assert n2 == 10  # cap disabled ⇒ full 5-choose-2


def test_pack_sequences_one_exchange_and_straddle(spark):
    from wikidata_sparql_history_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "a b c"), (8, "d e"), (16, " ".join(["w"] * 7)),
         (1, "x y z")],
        "doc_id long, text string",
    )
    out = text_ops.pack_sequences(docs, budget=4, n_shards=8)
    got = {r.doc_id: (r.shard, r.n_tokens, r.bin_id, r.bin_offset)
           for r in out.collect()}
    # shard 0 packs 0(3 toks) -> 8(2) -> 16(7): starts 0, 3, 5
    assert got[0] == (0, 3, 0, 0)
    assert got[8] == (0, 2, 0, 3)   # straddles bins 0->1
    assert got[16] == (0, 7, 1, 1)
    assert got[1] == (1, 3, 0, 0)
    # scale claim: exactly ONE exchange (the shard window shuffle);
    # after collect() AQE prints Final+Initial sections — count only
    # the final one
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final[:1500]


def test_domain_filter_drops_blocked(spark):
    from wikidata_sparql_history_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "see http://bad.example.com now"),
         (2, "see http://ok.example.com now"),
         (3, "no links at all"),
         (4, "SEE HTTP://BAD.EXAMPLE.COM upper")],
        "doc_id long, text string",
    )
    out = text_ops.domain_filter(docs, ["bad.example.com"])
    assert {r.doc_id for r in out.collect()} == {2, 3}
    doms = text_ops.url_domains(docs)
    assert {(r.doc_id, r.domain) for r in doms.collect()} == {
        (1, "bad.example.com"), (2, "ok.example.com"),
        (4, "bad.example.com"),
    }
