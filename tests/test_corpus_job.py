"""End-to-end corpus-preparation composition: every url is accounted for
exactly once (clean or a reject reason), duplicates and near-duplicates
are removed, quality/lang filters hold."""

import pandas as pd
import pytest

from image_pdf_ocr_suite_spark import fixtures
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from jobs.corpus_job import clean_corpus


@pytest.fixture(scope="module")
def pages(spark):
    rows = [(i, " ".join(f"c{i}_{j}" for j in range(30)), "ja") for i in range(25)]
    pdf = fixtures.build_pages_pdf(rows)
    # plant an exact duplicate: url 24 gets url 20's payload
    payloads = list(pdf["html"])
    payloads[24] = payloads[20]
    pdf["html"] = payloads
    return spark.createDataFrame(pdf)


def test_clean_corpus_accounting(spark, pages):
    clean, rejects = clean_corpus(pages, ExtractConfig(), min_tokens=5,
                                  langs=("en", "ja", "unknown"), run_id="t")
    c = {r["url"]: r for r in clean.collect()}
    rej = {}
    for r in rejects.collect():
        rej.setdefault(r["url"], []).append(r["reason"])

    all_urls = {fixtures.url_for(i) for i in range(25)}
    assert set(c) | set(rej) == all_urls
    assert not (set(c) & set(rej))                 # exactly one fate per url
    assert all(len(v) == 1 for v in rej.values())  # one reason each

    # quarantined edge docs rejected with their kinds
    assert rej[fixtures.url_for(11)] == ["encrypted"]
    assert rej[fixtures.url_for(17)] == ["corrupt"]
    # the planted duplicate: exactly one of (20, 24) survives
    dup = {fixtures.url_for(20), fixtures.url_for(24)}
    assert len(dup & set(c)) == 1
    surviving_dup_reject = (dup - set(c)).pop()
    assert rej[surviving_dup_reject] in (["exact_dup"], ["near_dup"])
    # empty doc (id 5 -> text "\n") fails the quality floor
    assert rej[fixtures.url_for(5)] == ["low_quality"]
    # clean docs satisfy the filters
    for r in c.values():
        assert r["n_tokens"] >= 5
        assert r["script_lang"] in ("en", "ja", "unknown")
