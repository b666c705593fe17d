"""Salted two-phase aggregation: correct results and salt spread on a
hot-key distribution."""

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.relational.salted import salted_agg


def test_salted_agg_matches_plain(spark):
    # hot key: user 0 owns 80% of rows
    rows = [(0 if i % 5 else i % 7, float(i % 100), i) for i in range(5000)]
    df = spark.createDataFrame(rows, "user_id int, value double, seq int")
    got = {r["user_id"]: (r["n_value"], r["sum_seq"], r["max_seq"])
           for r in salted_agg(df, ["user_id"], n_salts=8,
                               counts=["value"], sums=["seq"], maxs=["seq"]).collect()}
    exp = {r["user_id"]: (r["n"], r["s"], r["m"])
           for r in df.groupBy("user_id").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum("seq").alias("s"), F.max("seq").alias("m")).collect()}
    assert got == exp


def test_salt_actually_spreads_hot_key(spark):
    rows = [(42, float(i), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id int, value double, seq int")
    salt = F.pmod(F.xxhash64("user_id", "value", "seq"), F.lit(8))
    n_buckets = df.select(salt.alias("s")).distinct().count()
    assert n_buckets == 8  # the single hot key fans out over all salts
