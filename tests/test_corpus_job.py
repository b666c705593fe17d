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


CHAIN_A = " ".join(f"a{j}" for j in range(30))
CHAIN_B = " ".join(f"a{j}" for j in range(29)) + " zz"
CHAIN_C = "qq " + " ".join(f"a{j}" for j in range(1, 29)) + " zz"
# LSH-candidate pair with LOW Jaccard (deterministic: shares only the
# "p0 p1 p2" prefix whose shingle happens to be a band minimum for both)
LOWSIM_P = "p0 p1 p2 " + " ".join(f"u0x{i}" for i in range(27))
LOWSIM_Q = "p0 p1 p2 " + " ".join(f"v0x{i}" for i in range(27))
NEARDUP_R = "p0 p1 p2 " + " ".join(f"v0x{i}" for i in range(26)) + " rr"


@pytest.fixture(scope="module")
def neardup_pages(spark):
    """Planted near-dup scenarios (ids chosen to avoid % 29 edge payloads):
    - 100,101,102: verified near-dup 3-chain (same layout seed) — the
      component keeps exactly its smallest url;
    - 106,107: LSH candidate pair with Jaccard ~0.13 — BOTH must survive;
    - 107,108: verified near-dup pair — keeps 107."""
    rows = [(i, " ".join(f"c{i}_{j}" for j in range(30)), "ja")
            for i in (90, 91, 93)]
    rows += [(100, CHAIN_A, "ja"), (101, CHAIN_B, "ja"), (102, CHAIN_C, "ja"),
             (106, LOWSIM_P, "ja"), (107, LOWSIM_Q, "ja"), (108, NEARDUP_R, "ja")]
    pdf = fixtures.build_pages_pdf(rows)
    # same layout seed for the chain: near-identical extracted text
    payloads = list(pdf["html"])
    by_id = {r[0]: i for i, r in enumerate(rows)}
    for did, text in ((101, CHAIN_B), (102, CHAIN_C)):
        payloads[by_id[did]] = spdf.encode(fixtures.build_document(100, text))
    pdf["html"] = payloads
    return spark.createDataFrame(pdf)


def test_decontamination_and_pii_stages(spark):
    """Optional hygiene tail of the composition: a surviving doc whose
    5-grams appear in the held-out set is rejected `contaminated`; with
    --redact-pii the final text has placeholders, and dedup still ran on
    the ORIGINAL bytes (redaction is the last stage)."""
    rows = [(i, " ".join(f"d{i}_{j}" for j in range(30)), "ja")
            for i in (64, 65, 66)]
    rows.append((67, "reach me at bob@mail.example.com soon "
                 + " ".join(f"d67_{j}" for j in range(25)), "ja"))
    pages = spark.createDataFrame(fixtures.build_pages_pdf(rows))
    u = fixtures.url_for

    base, _ = clean_corpus(pages, ExtractConfig(), min_tokens=5,
                           langs=("en", "ja", "unknown"), run_id="t3")
    victim_row = base.where(base.url == u(64)).select("url", "text")
    assert victim_row.count() == 1

    clean, rejects = clean_corpus(pages, ExtractConfig(), min_tokens=5,
                                  langs=("en", "ja", "unknown"),
                                  decontam_test=victim_row, decontam_n=5,
                                  redact_pii=True, run_id="t4")
    kept = {r["url"]: r["text"] for r in clean.collect()}
    rej = {r["url"]: r["reason"] for r in rejects.collect()}
    assert u(64) not in kept and rej[u(64)] == "contaminated"
    assert u(65) in kept and u(66) in kept
    assert "<EMAIL>" in kept[u(67)] and "bob@mail.example.com" not in kept[u(67)]
    # exactly-once accounting still holds with the new stages
    assert not (set(kept) & set(rej))
    assert set(kept) | set(rej) == {u(i) for i in (64, 65, 66, 67)}


def test_near_dup_verification_and_components(spark, neardup_pages):
    clean, rejects = clean_corpus(neardup_pages, ExtractConfig(), min_tokens=5,
                                  langs=("en", "ja", "unknown"),
                                  jaccard=0.5, run_id="t2")
    kept = {r["url"] for r in clean.collect()}
    rej = {r["url"]: r["reason"] for r in rejects.collect()}

    u = fixtures.url_for
    # chain component {100,101,102}: exactly the smallest url survives —
    # greedy pair-drop would also delete 102 against the kept 100
    assert u(100) in kept and u(101) not in kept and u(102) not in kept
    assert rej[u(101)] == "near_dup" and rej[u(102)] == "near_dup"
    # the below-threshold LSH candidate pair survives verification intact
    assert u(106) in kept
    # verified pair (107,108): component keeps 107, drops 108
    assert u(107) in kept and u(108) not in kept
    assert rej[u(108)] == "near_dup"
    # unrelated docs untouched
    assert {u(90), u(91), u(93)} <= kept


def test_rare_token_ceiling_rejects_hash_soup(spark):
    # 10 docs of shared natural-ish text + 2 docs of unique hash soup:
    # soup tokens are corpus-hapax, so their rare ratio is ~1.0
    rows = [(i, "alpha beta gamma delta " * 5, "ja") for i in range(10)]
    # soup docs: every token is a corpus hapax (freq 1 < min_count 3);
    # ids 12/13 avoid the doc_id%29 edge slots (5 empty, 11 encrypted)
    rows += [(12, " ".join(f"qz{j}x{j * 7}" for j in range(20)), "ja"),
             (13, " ".join(f"ab{j}c{j * 13}" for j in range(20)), "ja")]
    pages = spark.createDataFrame(fixtures.build_pages_pdf(rows))
    clean, rejects = clean_corpus(
        pages, ExtractConfig(), min_tokens=5,
        langs=("en", "ja", "unknown"), max_rare_ratio=0.5, run_id="soup")
    soup_urls = {fixtures.url_for(12), fixtures.url_for(13)}
    kept = {r["url"] for r in clean.collect()}
    reasons = {r["url"]: r["reason"] for r in rejects.collect()
               if r["url"] in soup_urls}
    # hash-soup docs rejected with the dedicated reason, nothing else
    assert not (kept & soup_urls)
    assert set(reasons.values()) <= {"rare_token_soup", "exact_dup",
                                     "near_dup"}
    assert "rare_token_soup" in reasons.values()
    # every url still accounted exactly once
    all_urls = {fixtures.url_for(i) for i in range(10)} | soup_urls
    rej_urls = {r["url"] for r in rejects.collect()}
    assert kept | rej_urls >= {u for u in all_urls} - set()
    assert not kept & rej_urls


def test_clean_corpus_shuffle_fallback_identical(spark, pages):
    """broadcast_max_ids=0 forces the url-shuffle anti-join (the
    dup-heavy 100-TB fallback); the output must be set-identical to the
    broadcast path on both the clean and reject sides."""
    kw = dict(min_tokens=5, langs=("en", "ja", "unknown"))
    clean_b, rej_b = clean_corpus(pages, ExtractConfig(), run_id="tb", **kw)
    clean_s, rej_s = clean_corpus(pages, ExtractConfig(), run_id="ts",
                                  broadcast_max_ids=0, **kw)
    assert sorted((r["url"], r["n_tokens"]) for r in clean_b.collect()) == \
        sorted((r["url"], r["n_tokens"]) for r in clean_s.collect())
    assert sorted((r["url"], r["reason"]) for r in rej_b.collect()) == \
        sorted((r["url"], r["reason"]) for r in rej_s.collect())


def test_jaccard_verify_shuffle_fallback_identical(spark):
    from pyspark.sql import functions as F

    from image_pdf_ocr_suite_spark.analytics import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" if j % 3 else f"shared{j}"
                      for j in range(20))) for i in range(12)],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 3), (1, 4), (2, 5), (6, 9)], "id_a long, id_b long")
    bcast = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.jaccard_verify_pairs(pairs, docs).collect()}
    shuf = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_verify_pairs(
                pairs, docs, broadcast_max_ids=0).collect()}
    assert bcast == shuf and len(bcast) == 4
