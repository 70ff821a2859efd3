"""Triple-pattern dispatch front door (SURVEY.md §2.2 P4).

Reference analog: ``RocksTripleSource.getStatements(s, p, o, context)``
(RocksTripleSource.java:91-181) — the single entry point every SPARQL
triple pattern goes through. It picks an index by bound-variable
combination and a snapshot by named-graph context. The Spark analog
needs no index dispatch: every bound term becomes an equality filter
that Catalyst pushes into the (sorted, min/max-pruned) parquet scan —
the 8 bound/unbound combinations are one code path.

Context mirrors the reference's named graphs
(RocksTripleSource.java:107-139):

- ``None``                  — full history (all ranges, with validity)
- ``("state", rev)``        — triples live at revision ``rev``
- ``("additions", rev)``    — added exactly at ``rev``
- ``("deletions", rev)``    — deleted exactly at ``rev``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import views

_CONTEXTS = {"state", "additions", "deletions"}


def get_statements(
    ranges: DataFrame,
    subj: str | None = None,
    pred: str | None = None,
    obj: str | None = None,
    context: tuple[str, int] | None = None,
) -> DataFrame:
    """Return matching statements for any bound/unbound combination.

    With a snapshot context the output is (conv_id, subj, pred, obj);
    without one it keeps (range_start, range_end) — the "history"
    graph, where the same fact can appear once per validity range.
    """
    if context is None:
        out = ranges.select(
            "conv_id", "subj", "pred", "obj", "range_start", "range_end"
        )
    else:
        kind, rev = context
        if kind not in _CONTEXTS:
            raise ValueError(f"unknown context {kind!r}; one of {_CONTEXTS}")
        out = {
            "state": views.state_at,
            "additions": views.additions_at,
            "deletions": views.deletions_at,
        }[kind](ranges, rev)
    for col, val in (("subj", subj), ("pred", pred), ("obj", obj)):
        if val is not None:
            out = out.filter(F.col(col) == val)
    return out
