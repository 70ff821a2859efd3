"""Property-based dictionary tests (hypothesis).

Random term batches: build + extend must reproduce the pure-python
get-or-insert oracle — batch-1 terms ranked 1..n1 in sorted order and
id-stable under extension, new terms appended after max(id) in sorted
order among themselves (RocksStore.java:403-453 semantics behind
★kg_dict_encode / ★kg_dict_extend).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wikidata_sparql_history_spark.plans import encoding

term = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
case = st.tuples(
    st.lists(term, min_size=1, max_size=8, unique=True),
    st.lists(term, min_size=1, max_size=8, unique=True),
)


def _triples(spark, terms):
    rows = [(t, t, t) for t in terms]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@settings(max_examples=15, deadline=None)
@given(case)
def test_extend_matches_get_or_insert_oracle(spark, ab):
    batch1, batch2 = ab
    d1 = encoding.build_dictionary(_triples(spark, batch1))
    ext = encoding.extend_dictionary(d1, _triples(spark, batch2))
    got = {r["term"]: r["id"] for r in ext.collect()}

    # pure-python get-or-insert oracle
    want = {t: i + 1 for i, t in enumerate(sorted(set(batch1)))}
    n1 = len(want)
    for i, t in enumerate(sorted(set(batch2) - set(batch1))):
        want[t] = n1 + i + 1
    assert got == want
