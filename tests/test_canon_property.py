"""Property: folding ANY random identity-edge sequence delta-by-delta
through incremental_canonical_mapping equals batch canonical_mapping over
the union, and the resolved remap trail re-derives every final canon."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ckg_spark.operators.canonicalize import (
    canonical_mapping,
    incremental_canonical_mapping,
)

edge = st.tuples(st.integers(0, 17), st.integers(0, 17))
deltas_strategy = st.lists(
    st.lists(edge, min_size=0, max_size=8), min_size=1, max_size=4)


def _df(spark, pairs):
    rows = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs] or []
    if not rows:
        return spark.createDataFrame([], "ident_a string, ident_b string")
    return spark.createDataFrame(rows, "ident_a string, ident_b string")


@settings(max_examples=12, deadline=None)
@given(deltas=deltas_strategy)
def test_incremental_folds_equal_batch(spark, deltas):
    mapping, trail = None, []
    for d in deltas:
        mapping, remaps = incremental_canonical_mapping(
            mapping, _df(spark, d))
        mapping = mapping.cache()
        trail.extend((r["old_canonical_id"], r["new_canonical_id"])
                     for r in remaps.collect())
    got = {r["ident"]: r["canonical_id"] for r in mapping.collect()}

    all_pairs = [p for d in deltas for p in d]
    full = _df(spark, all_pairs)
    idents = full.select(F.col("ident_a").alias("ident")).unionByName(
        full.select(F.col("ident_b").alias("ident"))).distinct()
    want = {r["ident"]: r["canonical_id"]
            for r in canonical_mapping(full, idents).collect()}
    assert got == want

    # the remap trail, replayed in order, lands every retired canon on a
    # LIVE final canon (the invariant remap-on-read patching relies on)
    final = {}
    for old, new in trail:
        new = final.get(new, new)
        for k, v in list(final.items()):
            if v == old:
                final[k] = new
        final[old] = new
    live = set(want.values())
    for old, tgt in final.items():
        assert tgt in live and old not in live
