"""Text-analysis operators for training-data pipelines.

All JVM-side built-ins (whole-stage codegen) — no Python in the hot
path. Each has a DuckDB-SQL twin in __spark_entry__ oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny English stopword list used by the quality heuristic; both
# engines share the literal list so results are oracle-comparable
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]

WORD_RE = r"[A-Za-z0-9]+"  # no apostrophe: the literal is embedded in SQL strings


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens
    (BPE-ish proxy: words + punctuation pieces)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(WORD_RE), 0)).alias("word_tokens"),
        F.length("text").alias("n_chars"),
    )


# GPT-2-style pre-tokenizer, restricted to constructs RE2 (DuckDB)
# and Java regex share: contraction suffixes, space-prefixed letter /
# digit / punctuation runs, whitespace runs. (The upstream pattern's
# `\s+(?!\S)` lookahead is RE2-incompatible; trailing whitespace folds
# into the plain `\s+` branch instead — same token count.)
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Subword-ish token counting with the GPT-2 pre-tokenizer split —
    the count an LLM-data pipeline budgets against (actual BPE merges
    only split these pieces further, so this lower-bounds vocab-true
    counts at ~word granularity)."""
    pieces = F.regexp_extract_all("text", F.lit(BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(pieces).alias("bpe_pieces"),
        F.size(F.filter(pieces, lambda p: p.rlike("^ ?[A-Za-z]"))).alias(
            "word_pieces"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio.

    score = 0.4*min(1, words/100) + 0.4*stopword_ratio + 0.2*(1-punct_ratio),
    rounded to 4 decimals for oracle comparison.
    """
    words = F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), 0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length("text") > 0, n_punct / F.length("text")
    ).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_words / F.lit(100.0))
        + 0.4 * stop_ratio
        + 0.2 * (1 - punct_ratio)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """N-gram-heuristic language ID.

    A deterministic character-bigram vote: per configured language, a
    handful of signature bigrams; predicted = argmax hit count with
    tie-break on language code. (Real models aren't available in the
    sandbox; the operator shape — vote table broadcast + argmax — is
    the scale path.)
    """
    sigs = {
        "en": ["th", "he", "in", "er"],
        "de": ["ch", "ei", "sc", "de"],
        "fr": ["le", "ou", "es", "on"],
        "es": ["os", "la", "el", "en"],
        "zh": ["zh", "sh", "ng", "xi"],
    }
    lowered = F.lower("text")

    def hits(bigrams):
        return sum(
            (
                (F.length(lowered) - F.length(F.replace(lowered, F.lit(bg), F.lit(""))))
                / 2
            ).cast("long")
            for bg in bigrams
        )

    langs = sorted(sigs)  # fixed evaluation order: first max wins ties
    cols = {lang: hits(sigs[lang]) for lang in langs}
    best = F.greatest(*cols.values())
    expr = None
    for lang in langs:
        cond = cols[lang] == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return docs.select(
        "doc_id",
        expr.alias("pred_lang"),
        best.alias("sig_hits"),
    )


# PII patterns restricted to the RE2/Java-common regex subset so the
# DuckDB twin applies the identical rewrites in the identical order
PII_PATTERNS = [
    ("url", r"https?://[^ \t\n]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, clean, n_redactions): URL/email/phone redaction with
    placeholder tokens — the standard pre-training scrub. Order
    matters (URLs can contain @) and is fixed: url → email → phone."""
    clean = F.col("text")
    n = F.lit(0)
    for _, pat, token in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(clean, F.lit(pat), 0))
        clean = F.regexp_replace(clean, pat, token)
    return docs.select(
        "doc_id", clean.alias("clean"), n.cast("int").alias("n_redactions")
    )


def hash_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, split): deterministic engine-independent train/val/test
    assignment from the first hex digit of md5(id) — 12/2/2 of 16
    (75% / 12.5% / 12.5%). Stable under repartitioning, reproducible
    in any engine with md5, and independent of row order — the
    property a 100 TB corpus split must have (no RNG, no shuffle)."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    split = (
        F.when(h.isin(*"0123456789ab"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    )
    return docs.select(id_col, split.alias("split"))


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic per-domain downsampling to target mixture rates —
    the static data-mixing step of a training-data pipeline (keep each
    domain at its configured sampling rate, e.g. web 10%, code 100%).

    A doc survives iff its md5-derived uniform in [0,1) falls under
    its domain's weight: RNG-free, row-order-independent, stable
    under repartitioning (the hash_split property), and reproducible
    in any engine with md5. Domains absent from `weights` get
    `default_weight` (0 = drop — the drop is visible in the weights
    dict, not silent).

    100 TB shape: the weight table is a literal CASE expression
    (driver-side, broadcast-free) and the keep test is scan-side —
    ZERO shuffles, filter runs inside the file scan's codegen stage.
    """
    for d, w in weights.items():
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"mixture_sample: weight for {d!r} out of "
                             f"[0, 1]: {w}")
    # first 8 hex digits of md5 → uniform in [0, 1) with 2^-32 grain
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double") / float(1 << 32)
    w = F.lit(float(default_weight))
    for d, wt in sorted(weights.items()):
        w = F.when(F.col(domain_col) == d, F.lit(float(wt))).otherwise(w)
    return docs.filter(u < w)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 of case/punctuation-normalized
    text (identical in DuckDB, so oracle-comparable)."""
    norm = F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", "")
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, dup_word_frac, dup_bigram_frac): Gopher-style
    repetition signals (Rae et al. 2021 §A1.1): the fraction of
    duplicate unigrams / bigrams in a document — high values flag
    boilerplate and degenerate repetition for pretraining filters.

    Duplicate fraction = 1 − distinct/total, entirely array built-ins
    (split → array_distinct → size); bigrams via a transform HOF over
    index positions — per-doc arrays are tiny, so the lambda's
    element_at re-inlining (the round-2 O(len²) hazard on corpus-wide
    arrays) is irrelevant here."""
    ws = F.split(F.trim("text"), r"\s+")
    out = docs.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("ws", i), F.element_at("ws", i + 1)
        ),
    )
    out = out.select(
        "doc_id",
        n.alias("n_words"),
        F.when(n > 0,
               F.round(1 - F.size(F.array_distinct("ws")) / n.cast("double"), 4)
               ).otherwise(F.lit(0.0)).alias("dup_word_frac"),
        F.when(n > 1,
               F.round(
                   1 - F.size(F.array_distinct(bigrams))
                   / (n - 1).cast("double"), 4)
               ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
    )
    return out


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, bm25): Okapi BM25 relevance of each document to a
    fixed bag of query terms — the standard retrieval/quality-ranking
    score a training-data pipeline uses for relevance filtering.

    Shape at scale: one explode over the corpus feeding two hash
    aggregations (per-doc term frequencies restricted to the query
    terms, and per-term document frequencies — the latter is
    |terms|-rows and broadcast back), plus a one-row corpus-stats
    aggregate broadcast via crossJoin. No all-pairs, no Python; the
    formula is plain double arithmetic, so the DuckDB oracle is a
    direct dual-engine twin (ln == ln), rounded to 4 dp.
    """
    low = F.lower(F.col("text"))
    words = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(low, F.lit(WORD_RE), 0)).alias("term"),
    )
    dl = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(WORD_RE), 0))
        .cast("double")
        .alias("dl"),
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        words.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    per_doc = (
        scored.withColumn("c", idf * F.col("tf") * (k1 + 1) / denom)
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 4).alias("bm25"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )


def pack_sequences(
    docs: DataFrame, budget: int = 2048, n_shards: int = 64
) -> DataFrame:
    """Concat-then-chunk sequence packing (LLM pretraining batch prep):
    documents are conceptually concatenated in a deterministic order
    and cut every `budget` tokens; each doc learns which context
    window (bin) its first token lands in and at what offset.

    Sharded for scale: a single global cumsum would serialize on one
    partition at 100 TB, so docs are hash-sharded (pmod(doc_id),
    engine-independent) and packed per shard — the standard
    data-parallel packing layout (each worker consumes whole shards).
    ONE shuffle: the window repartitions by shard and sorts by doc_id
    within it. Token counts use the shared WORD_RE tokenizer.

    Output: (doc_id, shard, n_tokens, bin_id, bin_offset) where
    bin_id counts bins WITHIN the shard and bin_offset is the doc's
    start position inside its bin. Docs longer than `budget` straddle
    bins, exactly like the real concat-then-chunk pipeline.
    """
    from pyspark.sql import Window

    shard = F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    n_tok = F.size(F.regexp_extract_all("text", F.lit(WORD_RE), 0))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id",
        shard.alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return toks.select("doc_id", "shard", "n_tokens", start).select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("_start") / budget).cast("long").alias("bin_id"),
        F.pmod(F.col("_start"), F.lit(budget)).cast("long").alias("bin_offset"),
    )


URL_RE = r"https?://[A-Za-z0-9.-]+"  # scheme + host only (shared Java/RE2/DuckDB subset)


def url_domains(docs: DataFrame) -> DataFrame:
    """(doc_id, domain) — one row per distinct lowercased host
    mentioned in the text (scan-side regexp, explode, distinct)."""
    hosts = F.regexp_extract_all(F.lower("text"), F.lit(URL_RE), 0)
    return (
        docs.select("doc_id", F.explode(hosts).alias("url"))
        .select(
            "doc_id",
            F.regexp_replace("url", r"^https?://", "").alias("domain"),
        )
        .distinct()
    )


def domain_filter(docs: DataFrame, blocked: list[str]) -> DataFrame:
    """Drop documents that mention any blocked domain (crawl-pipeline
    URL filtering). The blocklist is a driver-side literal IN-list —
    at 100 TB scale a large blocklist becomes a broadcast anti-join on
    url_domains(docs) instead; this form keeps the filter scan-side
    for the common small-blocklist case.

    Output: the surviving docs (doc_id, text)."""
    hosts = F.regexp_extract_all(F.lower("text"), F.lit(URL_RE), 0)
    hit = F.exists(
        F.transform(hosts, lambda u: F.regexp_replace(u, r"^https?://", "")),
        lambda d: d.isin([b.lower() for b in blocked]),
    )
    return docs.filter(~hit).select("doc_id", "text")
