"""Salted-aggregation/join correctness: salted results must equal the
unsalted plans exactly, and hot keys must actually spread."""

from pyspark.sql import functions as F

from hadoop_search_spark.operators.skew import salted_count, salted_join, salted_sum


def _skewed(spark, n_hot=5000, n_tail=500):
    hot = spark.range(n_hot).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    tail = spark.range(n_tail).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(tail).repartition(8)


def test_salted_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r.cnt for r in salted_count(df, ["k"]).collect()}
    assert salted == plain
    assert salted["hot"] == 5000


def test_salted_sum_equals_plain(spark):
    df = _skewed(spark)
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.sum_value for r in salted_sum(df, ["k"], F.col("v")).collect()}
    assert salted == plain


def test_salted_count_spreads_hot_key(spark):
    from hadoop_search_spark.operators.skew import _row_salt

    df = _skewed(spark)
    partials = (
        df.withColumn("_salt", _row_salt(df, 16))
        .groupBy("k", "_salt")
        .count()
        .filter(F.col("k") == "hot")
        .count()
    )
    assert partials > 1  # hot key really split across salt buckets


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5)] + [(f"t{i}", float(i)) for i in range(50)], "k STRING, w DOUBLE"
    )
    plain = big.join(small, "k").groupBy("k").agg(F.sum("w").alias("s"))
    salted = salted_join(big, small, "k").groupBy("k").agg(F.sum("w").alias("s"))
    assert {(r.k, r.s) for r in plain.collect()} == {
        (r.k, r.s) for r in salted.collect()
    }


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, v INT")
    small = spark.createDataFrame([("a", 9.0)], "k STRING, w DOUBLE")
    rows = {r.k: r.w for r in salted_join(big, small, "k", how="left").collect()}
    assert rows == {"a": 9.0, "b": None}
