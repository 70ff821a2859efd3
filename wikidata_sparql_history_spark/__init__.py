"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of
Tpt/wikidata-sparql-history (reference at /root/reference, Java) as an
idiomatic PySpark pipeline over tables of multi-turn transcripts:

- stable turn ordering per conversation (window functions)
- batched mention detection + triple extraction (pandas/Arrow UDFs)
- entity linking (broadcast dict + salted join for hot-key skew)
- canonicalization (connected components over alias edges,
  iterative joins with checkpointed frontiers)
- per-triple validity-range coalescing (the reference's
  revision-range semantics, RevisionFileConverter.java:128-164)
- materialized triple / adjacency tables + snapshot views
  (state_at / additions / deletions, RocksTripleSource.java analogs)

Everything is DataFrame-first: Catalyst plans the physical strategy;
custom logic is vectorized pandas UDFs only (no per-row Python).
"""

__version__ = "0.1.0"

LONG_MAX = 9223372036854775807  # sentinel: range still live (Long.MAX_VALUE)
