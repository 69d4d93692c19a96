"""Salting utilities: correctness vs unsalted on a skewed key distribution."""

import random

from pyspark.sql import functions as F

from ckg_spark.operators import skew as SK


def _skewed(spark, n=20_000, hot_frac=0.6, seed=2):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = "HOT" if rng.random() < hot_frac else f"k{rng.randint(0, 200)}"
        rows.append((k, f"v{rng.randint(0, 500)}"))
    return spark.createDataFrame(rows, "key string, value string")


def test_salted_collect_set_matches_plain(spark):
    df = _skewed(spark)
    got = SK.salted_collect_set(df, ["key"], "value", buckets=8).toPandas()
    exp = (
        df.groupBy("key")
        .agg(F.array_sort(F.collect_set("value")).alias("values"))
        .toPandas()
    )
    g = {r.key: list(r.values) for r in got.itertuples()}
    e = {r.key: list(r.values) for r in exp.itertuples()}
    assert g == e


def test_salted_count_distinct_matches_plain(spark):
    df = _skewed(spark)
    got = SK.salted_count_distinct(df, ["key"], "value", buckets=8).toPandas()
    exp = df.groupBy("key").agg(F.countDistinct("value").alias("n_distinct")).toPandas()
    g = dict(zip(got["key"], got["n_distinct"]))
    e = dict(zip(exp["key"], exp["n_distinct"]))
    assert g == e


def test_salted_join_matches_plain(spark):
    big = _skewed(spark, n=10_000)
    small = spark.createDataFrame(
        [("HOT", 1), ("k3", 2), ("k7", 3)], "key string, attr int"
    )
    got = SK.salted_join(big, small, on="key").groupBy("key", "attr").count()
    exp = big.join(small, on="key").groupBy("key", "attr").count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_salted_join_deterministic_across_partitions(spark):
    big = _skewed(spark, n=5_000)
    small = spark.createDataFrame([("HOT", 1)], "key string, attr int")
    a = SK.salted_join(big.repartition(2), small, on="key").count()
    b = SK.salted_join(big.repartition(16), small, on="key").count()
    assert a == b
