"""Table-partitioning demo: the input_hint's `days(warc_ts)` partition
layout prunes at the scan — a crawl-date filter must not touch other
days' files."""

import re

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark import fixtures


@pytest.fixture(scope="module")
def partitioned_pages(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "pages")
    rows = [(i, f"w{i} " * 5, "ja") for i in range(40)]
    pdf = fixtures.build_pages_pdf(rows)
    # spread docs over 5 crawl days (fixture timestamps span minutes only)
    doc_no = F.substring("url", -8, 8).cast("int")
    df = spark.createDataFrame(pdf) \
        .withColumn("crawl_date",
                    F.date_add(F.to_date("warc_ts"), F.pmod(doc_no, F.lit(5))))
    df.write.partitionBy("crawl_date").parquet(path)
    return path


def test_date_filter_prunes_partitions(spark, partitioned_pages):
    df = spark.read.parquet(partitioned_pages)
    one_day = df.where(F.col("crawl_date") == "2024-01-01")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "crawl_date" in m.group(1), plan
    # the filter must NOT appear as a post-scan data filter — it's resolved
    # entirely at the partition level
    assert one_day.count() == 8          # 40 docs spread over 5 days
    assert df.count() == 40
