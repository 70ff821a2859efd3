"""Deterministic synthetic transcript corpus (FIXTURES.md §1, §4, §5).

Every value is a pure integer function of ``(c, t)`` — conversation
number and turn number — so the corpus is identical under any
parallelism / partitioning, and the *expected* extracted triples are
computable in closed form. The same formulas are emitted as DuckDB SQL
(`transcripts_sql`) so the driver's oracle harness can rebuild the
identical table and verify the whole KG pipeline end-to-end.

Grammar embedded in ``text`` (FIXTURES.md mention grammar, extended
round 3 with the statement-reification markers):

    c<c> t<t> [[E<s>]] (<<P<j_i>>>[!] [[E<k_i>]] [((P<qj_i>:E<qk_i>|?|!))] [{{S<r_i>}}]) x m

with
    n_turns(c) = 3 + (c*7) % 18            -- 3..20 turns
    turn_idx   = 2 + 3*t                   -- non-dense revision ids
    s(c)       = c % 50 if c % 3 == 0 else 7   -- E7 is the hot entity
                                               -- (~67% of subjects → skew)
    m(c,t)     = (c + t) % 4               -- 0..3 relation mentions
    j_i        = (c + t + i) % 7
    k_i        = (c*3 + t*5 + i*11) % 50
    !          = preferred-rank marker, when (c + t*3 + i) % 5 == 0
    qualifier ((P<qj>:<inner>)) when (c + t + i) % 3 == 0,
        qj_i = (c*2 + t + i) % 7; inner carries the snak forms on
        tri = (c + 2t + 5i) % 8: tri<=3 → E<qk> (ValueSnak) with
        qk_i = (c + t*7 + i*13) % 50, tri=4 → '?' (SomeValueSnak),
        tri=5 → '!' (NoValueSnak), tri>=6 → a complex-value marker
        (→ hashed wdv: node) with amt = (c*9 + t*4 + i*17) % 1000 and
        kind selected by amt % 3: 0 → V<amt> (quantity), 1 → T<amt>
        (time: 2024-01-01 + amt days, precision day), 2 → C<amt>
        (globe coordinate: lat = amt%180-90, lon = (amt*7)%360-180)
    reference {{S<r>}} when (c*5 + t + i) % 4 == 0,
        r_i = (c + t + i*3) % 20

The reification markers use delimiters disjoint from ``[[E]]``/``<<P>>``
so the base extraction grammar (mentions/preds regexes) is unchanged;
pipeline/reify.py parses the full segments (RdfBuilder.java:232-285
analog: statement nodes + rank + pq: qualifiers + prov:wasDerivedFrom
references).

Generation is Spark-native (`spark.range` + built-in expressions — no
driver-side loops, no Python UDFs) so it scales to bench sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

# --- column-expression building blocks (Spark side) ---------------------


def _turn_cols():
    c, t = F.col("c"), F.col("t")
    s = F.when(c % 3 == 0, c % 50).otherwise(F.lit(7))
    m = (c + t) % 4

    def seg(i: int):
        j = (c + t + F.lit(i)) % 7
        k = (c * 3 + t * 5 + F.lit(i) * 11) % 50
        # reification markers (RdfBuilder.java:232-285 analogs): rank,
        # pq: qualifier, prov:wasDerivedFrom reference — delimiters are
        # disjoint from [[E]]/<<P>> so base extraction is unchanged
        rank = F.when((c + t * 3 + F.lit(i)) % 5 == 0, F.lit("!")).otherwise(
            F.lit("")
        )
        qj = (c * 2 + t + F.lit(i)) % 7
        qk = (c + t * 7 + F.lit(i) * 13) % 50
        # snak forms (RdfBuilder.java:273-285 trichotomy + :377-425
        # complex values): entity value E<qk>, SomeValueSnak '?',
        # NoValueSnak '!', complex value V|T|C<amt> — quantity / time /
        # globe-coordinate (→ hashed wdv: nodes), kind = amt % 3
        tri = (c + 2 * t + 5 * F.lit(i)) % 8
        amt = (c * 9 + t * 4 + F.lit(i) * 17) % 1000
        marker = F.element_at(
            F.array(F.lit("V"), F.lit("T"), F.lit("C")),
            (amt % 3 + 1).cast("int"),
        )
        inner = (
            F.when(tri <= 3, F.concat(F.lit("E"), qk))
            .when(tri == 4, F.lit("?"))
            .when(tri == 5, F.lit("!"))
            .otherwise(F.concat(marker, amt))
        )
        qual = F.when(
            (c + t + F.lit(i)) % 3 == 0,
            F.concat(F.lit(" ((P"), qj, F.lit(":"), inner, F.lit("))")),
        ).otherwise(F.lit(""))
        rk = (c + t + F.lit(i) * 3) % 20
        ref = F.when(
            (c * 5 + t + F.lit(i)) % 4 == 0,
            F.concat(F.lit(" {{S"), rk, F.lit("}}")),
        ).otherwise(F.lit(""))
        return F.concat(
            F.lit(" <<P"), j, F.lit(">>"), rank,
            F.lit(" [[E"), k, F.lit("]]"), qual, ref,
        )

    # every turn asserts the persistent self-typing fact (E_s, P0, E_s)
    # so long coalescing islands exist at scale ([first_turn, MAX))
    text = F.concat(
        F.lit("c"), c, F.lit(" t"), t, F.lit(" [[E"), s, F.lit("]]"),
        F.lit(" <<P0>> [[E"), s, F.lit("]]"),
        F.when(m >= 1, seg(1)).otherwise(F.lit("")),
        F.when(m >= 2, seg(2)).otherwise(F.lit("")),
        F.when(m >= 3, seg(3)).otherwise(F.lit("")),
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (t % 3 + 1).cast("int"),
    )
    return {
        "conv_id": F.concat(F.lit("c"), c),
        "turn_idx": (F.lit(2) + 3 * t).cast("int"),
        "role": role,
        "text": text,
        "tool": F.when(t % 3 == 2, F.concat(F.lit("tool_"), (c + t) % 5)).otherwise(
            F.lit("")
        ),
        "ts": F.timestamp_seconds(F.lit(BASE_EPOCH) + (c % 3650) * 86400 + t * 60),
    }


def transcripts(spark: SparkSession, n_conv: int, shuffled: bool = True) -> DataFrame:
    """The primary input table: (conv_id, turn_idx, role, text, tool, ts).

    Rows come out hash-shuffled (not sorted) so the stable-ordering
    window logic is genuinely exercised (FIXTURES.md §1).
    """
    convs = spark.range(n_conv).withColumnRenamed("id", "c")
    df = convs.select(
        "c", F.explode(F.sequence(F.lit(0), (F.lit(2) + (F.col("c") * 7) % 18))).alias("t")
    )
    cols = _turn_cols()
    out = df.select(*(expr.alias(name) for name, expr in cols.items()))
    if shuffled:
        out = out.repartition(F.hash("conv_id", "turn_idx"))
    return out


def candidate_dict(spark: SparkSession) -> DataFrame:
    """Broadcast linking dictionary (FIXTURES.md §5).

    Every surface form ``E<k>`` has two candidates — the true entity
    ``Q<k>`` (prior .9) and a decoy ``Q<k+1000>`` (prior .4) — so the
    linker's argmax-prior tie-break is exercised.
    """
    ks = spark.range(50).withColumnRenamed("id", "k")
    true = ks.select(
        F.concat(F.lit("E"), "k").alias("mention"),
        F.concat(F.lit("Q"), "k").alias("entity_id"),
        F.lit(0.9).alias("prior"),
    )
    decoy = ks.select(
        F.concat(F.lit("E"), "k").alias("mention"),
        F.concat(F.lit("Q"), F.col("k") + 1000).alias("entity_id"),
        F.lit(0.4).alias("prior"),
    )
    return true.unionByName(decoy)


def alias_edges(spark: SparkSession) -> DataFrame:
    """Alias edges over entity ids (FIXTURES.md §4).

    Q25..Q49 → Q0..Q24 and Q20..Q24 → Q0..Q4, giving 2-hop chains
    (e.g. Q45 → Q20 → Q0) for connected-components canonicalization.
    Analog of the reference's redirect → owl:sameAs emission
    (RevisionFileConverter.java:110-116).
    """
    k = F.col("k")
    hi = (
        spark.range(25, 50)
        .withColumnRenamed("id", "k")
        .select(
            F.concat(F.lit("Q"), k).alias("src"),
            F.concat(F.lit("Q"), k - 25).alias("dst"),
        )
    )
    mid = (
        spark.range(20, 25)
        .withColumnRenamed("id", "k")
        .select(
            F.concat(F.lit("Q"), k).alias("src"),
            F.concat(F.lit("Q"), k - 20).alias("dst"),
        )
    )
    return hi.unionByName(mid)


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Derive a transcript-shaped table from the driver's `events`
    star-schema table (TESTDATA.md), deterministically: conversation =
    user, turn order = (ts, event_id), text = the same mention grammar
    keyed by (user_id, turn position). Lets the whole KG pipeline run
    over driver-provided parquet and be oracle-checked in DuckDB.
    """
    from pyspark.sql import Window

    # r7: the window is keyed on conv_id ('u' || user_id — a bijection
    # of user_id, so groups and order are IDENTICAL to partitioning by
    # user_id) instead of user_id. Row-for-row the output is unchanged,
    # but it now comes out hash-partitioned by conv_id — the key every
    # downstream consumer (ordered_turns, construct_ranges, per-conv
    # aggregations) clusters on — so the wide generated `text` column
    # is born AFTER this table's only exchange and never crosses a
    # shuffle itself (guide §2.3 "shuffle fewer bytes" / §2.4 "remove
    # shuffles outright": the narrow events rows shuffle once; the
    # ~300-byte texts, never).
    base = events.select(
        F.concat(F.lit("u"), "user_id").alias("conv_id"),
        "event_id", "event_type", "ts",
        F.col("user_id").alias("c"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    base = base.withColumn("t", F.row_number().over(w) - 1)
    cols = _turn_cols()
    return base.select(
        "conv_id",
        (F.lit(2) + 3 * F.col("t")).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        cols["text"].alias("text"),
        cols["tool"].alias("tool"),
        F.col("ts").alias("ts"),
    )


def _seg_sql(i: int) -> str:
    """DuckDB twin of `_turn_cols().seg(i)` — must stay formula-identical
    to the Spark expressions (both engines rebuild the same text)."""
    return (
        f"CASE WHEN m >= {i} THEN ' <<P' || ((c+t+{i}) % 7) || '>>'"
        f" || CASE WHEN (c + t*3 + {i}) % 5 = 0 THEN '!' ELSE '' END"
        f" || ' [[E' || ((c*3+t*5+{i * 11}) % 50) || ']]'"
        f" || CASE WHEN (c+t+{i}) % 3 = 0 THEN"
        f" ' ((P' || ((c*2+t+{i}) % 7) || ':' ||"
        f" CASE WHEN (c + 2*t + {5 * i}) % 8 <= 3"
        f" THEN 'E' || ((c+t*7+{i * 13}) % 50)"
        f" WHEN (c + 2*t + {5 * i}) % 8 = 4 THEN '?'"
        f" WHEN (c + 2*t + {5 * i}) % 8 = 5 THEN '!'"
        f" ELSE (ARRAY['V','T','C'])"
        f"[CAST(((c*9+t*4+{i * 17}) % 1000) % 3 AS INTEGER) + 1]"
        f" || ((c*9+t*4+{i * 17}) % 1000) END"
        f" || '))' ELSE '' END"
        f" || CASE WHEN (c*5+t+{i}) % 4 = 0 THEN"
        f" ' {{{{S' || ((c+t+{i * 3}) % 20) || '}}}}' ELSE '' END"
        " ELSE '' END"
    )


def transcripts_from_events_sql() -> str:
    """DuckDB twin of `transcripts_from_events` over the pre-registered
    `events` view."""
    return f"""
WITH ev AS (
  SELECT user_id AS c,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         event_type, ts
  FROM events
),
g AS (
  SELECT c, t, event_type, ts,
    CASE WHEN c % 3 = 0 THEN c % 50 ELSE 7 END AS s,
    (c + t) % 4 AS m
  FROM ev
)
SELECT
  'u' || c AS conv_id,
  CAST(2 + 3*t AS INTEGER) AS turn_idx,
  event_type AS role,
  'c' || c || ' t' || t || ' [[E' || s || ']]'
    || ' <<P0>> [[E' || s || ']]'
    || {_seg_sql(1)}
    || {_seg_sql(2)}
    || {_seg_sql(3)}
    AS text,
  CASE WHEN t % 3 = 2 THEN 'tool_' || ((c+t) % 5) ELSE '' END AS tool,
  ts
FROM g
"""


# --- DuckDB-SQL twins (oracle side) --------------------------------------


def transcripts_sql(n_conv: int) -> str:
    """DuckDB SQL producing the byte-identical transcripts table."""
    return f"""
WITH convs AS (SELECT range AS c FROM range(0, {n_conv})),
turns AS (
  SELECT c, unnest(generate_series(0, 2 + (c*7) % 18)) AS t FROM convs
),
g AS (
  SELECT c, t,
    CASE WHEN c % 3 = 0 THEN c % 50 ELSE 7 END AS s,
    (c + t) % 4 AS m
  FROM turns
)
SELECT
  'c' || c AS conv_id,
  CAST(2 + 3*t AS INTEGER) AS turn_idx,
  (ARRAY['user','assistant','tool'])[CAST(t % 3 AS INTEGER) + 1] AS role,
  'c' || c || ' t' || t || ' [[E' || s || ']]'
    || ' <<P0>> [[E' || s || ']]'
    || {_seg_sql(1)}
    || {_seg_sql(2)}
    || {_seg_sql(3)}
    AS text,
  CASE WHEN t % 3 = 2 THEN 'tool_' || ((c+t) % 5) ELSE '' END AS tool,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ((c % 3650)*86400 + t*60) SECOND AS ts
FROM g
"""


def candidate_dict_sql() -> str:
    return """
SELECT 'E' || range AS mention, 'Q' || range AS entity_id, 0.9 AS prior
FROM range(0, 50)
UNION ALL
SELECT 'E' || range, 'Q' || (range + 1000), 0.4 FROM range(0, 50)
"""


def alias_edges_sql() -> str:
    return """
SELECT 'Q' || range AS src, 'Q' || (range - 25) AS dst FROM range(25, 50)
UNION ALL
SELECT 'Q' || range, 'Q' || (range - 20) FROM range(20, 25)
"""
