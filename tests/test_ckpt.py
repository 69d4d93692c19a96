"""checkpoint_reset_stats (operators/ckpt.py): the iterative-checkpoint
stats-compounding guard found in round 4."""

from pyspark.sql import functions as F

from ckg_spark.operators import ckpt as CK


def _size_digits(df):
    return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def test_reset_stats_does_not_compound(spark):
    """Plain localCheckpoint INHERITS Catalyst's multiplicative join-size
    estimate, so iterative self-joins double its digit count every round
    (and eventually the driver burns minutes multiplying million-digit
    BigIntegers in canBroadcastBySize). The reset helper must keep the
    estimate flat across rounds — and preserve values exactly."""
    df = spark.createDataFrame(
        [("x", 1.0), ("y", 2.0)], "a string, w double")
    plain = df.localCheckpoint(eager=True)
    reset = CK.checkpoint_reset_stats(df)
    for _ in range(3):
        plain = (plain.alias("l").join(plain.alias("r"), on="a")
                 .select("a", (F.col("l.w") + F.col("r.w")).alias("w"))
                 .localCheckpoint(eager=True))
        reset = CK.checkpoint_reset_stats(
            reset.alias("l").join(reset.alias("r"), on="a")
            .select("a", (F.col("l.w") + F.col("r.w")).alias("w")))
    assert _size_digits(plain) > 100      # the failure mode, demonstrated
    assert _size_digits(reset) <= 20      # the fix: flat at defaultSize
    assert sorted(r["w"] for r in reset.collect()) == [8.0, 16.0]
    assert [r["w"] for r in plain.collect()] == [r["w"] for r in reset.collect()] or \
           sorted(r["w"] for r in plain.collect()) == sorted(r["w"] for r in reset.collect())


def test_reset_stats_preserves_schema_and_partitioning(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.rand(5).alias("v"))
    out = CK.checkpoint_reset_stats(df.repartition(4, "k"))
    assert out.schema == df.schema
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100
