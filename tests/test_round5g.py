"""Round-5g operators: trained language-ID classifier, URL quality
filter, compression-ratio quality signal."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import corpusprep, langclf


# ---------------------------------------------------------------------------
# trained language-ID classifier
# ---------------------------------------------------------------------------

LANG_SAMPLES = {
    "en": "the cat and the dog were in the house for the winter and it was",
    "de": "der hund und die katze sind nicht in dem haus mit einem kind",
    "fr": "le chien et le chat sont dans la maison pour les enfants et des",
}


def _mk_rows(n_per_lang: int = 12):
    rows, i = [], 0
    for lang, base in LANG_SAMPLES.items():
        for k in range(n_per_lang):
            rows.append((i, f"{base} variant {k} extra words here", lang))
            i += 1
    return rows


def test_langid_train_is_deterministic_and_learns():
    rows = _mk_rows()
    train = [(t, y) for _i, t, y in rows]
    c1, w1 = langclf.replay_train(train)
    c2, w2 = langclf.replay_train(train)
    assert c1 == c2 == sorted(LANG_SAMPLES)
    assert (w1 == w2).all()
    scores = langclf.replay_scores(rows, c1, w1)
    acc = sum(v[2] for v in scores.values()) / len(rows)
    assert acc == 1.0  # fully separable marker vocabularies


def test_langid_spark_scoring_matches_replay_bitwise(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    classes, w = langclf.train_langid(df, ref_mod=1)
    # driver-side replay trains over the id-ordered slice — same rows
    c2, w2 = langclf.replay_train([(t, y) for _i, t, y in rows])
    assert classes == c2 and (w == w2).all()
    got = {r["doc_id"]: (r["pred_lang"], r["score_q"], r["correct"])
           for r in langclf.score_langid(df, classes, w).collect()}
    exp = langclf.replay_scores(rows, classes, w)
    assert got == exp


def test_langid_edge_rows(spark):
    rows = [(0, LANG_SAMPLES["en"], "en"), (1, LANG_SAMPLES["de"], "de"),
            (2, "ab", "en"),      # shorter than one trigram: bias-only
            (3, "", "en"),        # empty
            (4, LANG_SAMPLES["en"], None)]   # unlabeled: correct = 0
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    classes, w = langclf.train_langid(df, ref_mod=1)
    out = {r["doc_id"]: r for r in langclf.score_langid(df, classes, w)
           .collect()}
    assert len(out) == 5
    # bias-only rows share one prediction (no feature signal)
    assert out[2]["pred_lang"] == out[3]["pred_lang"]
    assert out[4]["correct"] == 0 and out[4]["true_lang"] is None
    # unlabeled rows are excluded from training
    assert classes == ["de", "en"]


def test_langid_training_slice_is_label_filtered(spark):
    rows = [(0, LANG_SAMPLES["en"], "en"), (5, LANG_SAMPLES["de"], "de"),
            (10, LANG_SAMPLES["fr"], None), (3, LANG_SAMPLES["fr"], "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # ref_mod=5 keeps ids 0,5,10; the NULL-label row 10 must drop out
    classes, _w = langclf.train_langid(df, ref_mod=5)
    assert classes == ["de", "en"]


def test_langid_scoring_plan_is_map_only(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    classes, w = langclf.train_langid(df, ref_mod=1)
    plan = langclf.score_langid(df, classes, w) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# URL quality filter
# ---------------------------------------------------------------------------

URL_CASES = [
    (0, "https://badsite.example/x", "blocked_domain"),        # exact host
    (1, "https://dl.badsite.example/x", "blocked_domain"),     # subdomain
    (2, "HTTPS://WWW.SPAM.EXAMPLE.ORG/x", "blocked_domain"),   # case+www
    (3, "https://ok.example.com/free-casino/x", "score_reject"),  # 65 >= 50
    (4, "https://ok.example.com/free-download/x", "keep"),        # 15 < 50
    (5, "https://notbadsite.example.xyz/x", "keep"),   # suffix needs a dot
    (6, "plain text no scheme casino poker", "score_reject"),  # unparseable
    (7, "https://clean.example.com/docs/1", "keep"),
    (8, "https://poker.badsite.example/casino", "blocked_domain"),  # both
]


def test_url_filter_verdict_matrix(spark):
    df = spark.createDataFrame([(i, u) for i, u, _v in URL_CASES],
                               "doc_id long, url string")
    out = {r["doc_id"]: r for r in
           corpusprep.url_quality_filter(df).collect()}
    for i, _u, verdict in URL_CASES:
        assert out[i]["verdict"] == verdict, (i, out[i])
    # host parsing details
    assert out[2]["host"] == "spam.example.org"       # lowercased, www cut
    assert out[6]["host"] is None                     # unparseable
    assert out[6]["kw_score"] == 105                  # casino+poker on raw
    assert out[8]["kw_score"] == 105                  # blocklist wins anyway


def test_url_filter_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "https://a.example.com/x")],
                               "doc_id long, url string")
    plan = corpusprep.url_quality_filter(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# compression-ratio quality signal
# ---------------------------------------------------------------------------

def test_compression_ratio_separates_repetitive_text(spark):
    prose = ("the quick brown fox jumps over one lazy dog while seventeen "
             "violinists argue about baroque ornamentation in the rain")
    spammy = "buy now " * 40
    rows = [(0, prose), (1, spammy), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           corpusprep.compression_ratio(df).collect()}
    assert out[1]["ratio_bp"] < out[0]["ratio_bp"]
    for i, t in rows[:2]:
        assert out[i]["raw_len"] == len(t.encode("utf-8"))
        assert out[i]["comp_len"] == len(zlib.compress(t.encode("utf-8"), 6))
        assert out[i]["ratio_bp"] == \
            (10000 * out[i]["comp_len"]) // out[i]["raw_len"]
    assert out[2]["raw_len"] == 0 and out[2]["ratio_bp"] is None
    assert out[3]["raw_len"] is None and out[3]["ratio_bp"] is None


def test_compression_ratio_cjk_bytes_not_chars(spark):
    jp = "日本語のテキストです。" * 3
    df = spark.createDataFrame([(0, jp)], "doc_id long, text string")
    row = corpusprep.compression_ratio(df).collect()[0]
    assert row["raw_len"] == len(jp.encode("utf-8"))  # 3 bytes per char
    assert row["raw_len"] > len(jp)


# ---------------------------------------------------------------------------
# perceptual image hash + image near-dup
# ---------------------------------------------------------------------------

def test_dhash_ramp_hand_checks():
    import numpy as np
    from image_pdf_ocr_suite_spark.analytics.multimodal import (
        dhash_from_array)
    inc = np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))
    dec = inc[:, ::-1].copy()
    assert dhash_from_array(inc) == 0          # left<right everywhere
    assert dhash_from_array(dec) == -1         # all 64 bits set (signed)
    with pytest.raises(ValueError):
        dhash_from_array(np.zeros((4, 4), dtype=np.uint8))


def test_dhash_format_stable_and_quarantine(spark):
    from image_pdf_ocr_suite_spark.analytics import multimodal
    from image_pdf_ocr_suite_spark.fixtures import (
        dhash_gray_rows, dhash_image_payload_for)
    rows = dhash_gray_rows(7)
    h, w = rows.shape
    p5 = b"P5 %d %d 255\n" % (w, h) + rows.tobytes()
    p6 = b"P6 %d %d 255\n" % (w, h) + rows.repeat(3).tobytes()
    df = spark.createDataFrame(
        [("gray", bytearray(p5)), ("rgb", bytearray(p6)),
         ("null", None), ("junk", bytearray(b"GIF89a" + bytes(64))),
         ("tiny", bytearray(b"P5 4 4 255\n" + bytes(16)))],
        "id string, image binary")
    out = {r["id"]: r for r in multimodal.image_dhash(df).collect()}
    assert out["gray"]["dhash"] == out["rgb"]["dhash"]  # luma(v,v,v) == v
    assert out["gray"]["err"] is None
    assert out["null"]["err"] == "null_payload"
    assert out["junk"]["err"] == "NotImplementedError"
    assert out["tiny"]["err"] == "ValueError"
    # the replay never decodes bytes — decoder round-trip cross-check
    from image_pdf_ocr_suite_spark.analytics.multimodal import (
        dhash_from_array)
    assert out["gray"]["dhash"] == dhash_from_array(rows)
    assert dhash_image_payload_for(30) is None            # %31 null row


def test_image_near_dup_recovers_planted_groups(spark):
    import itertools
    from image_pdf_ocr_suite_spark.analytics import multimodal
    from image_pdf_ocr_suite_spark.analytics.multimodal import (
        dhash_from_array)
    from image_pdf_ocr_suite_spark.fixtures import (
        dhash_gray_rows, dhash_image_payload_for)
    ids = [i for i in range(32) if dhash_image_payload_for(i) is not None]
    df = spark.createDataFrame(
        [(str(i), bytearray(dhash_image_payload_for(i))) for i in ids],
        "id string, image binary")
    hashes = multimodal.image_dhash(df)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in multimodal.image_near_dup_pairs(hashes).collect()}
    # brute-force ground truth (pigeonhole losslessness at <= 3 bits)
    hs = {str(i): dhash_from_array(dhash_gray_rows(i)) for i in ids}
    exp = {}
    for a, b in itertools.combinations(sorted(hs), 2):
        d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            exp[(a, b)] = d
    assert got == exp
    # the planted structure is non-trivial: pairs exist, all within-group
    assert got
    assert all(int(a) // 4 == int(b) // 4 for a, b in got)


def test_video_dhash_frames_and_errs(spark):
    from image_pdf_ocr_suite_spark.analytics import multimodal
    from image_pdf_ocr_suite_spark.analytics.multimodal import (
        dhash_from_array)
    from image_pdf_ocr_suite_spark.fixtures import (
        dhash_video_frames, dhash_video_payload_for)
    rows = [(str(i), dhash_video_payload_for(i)) for i in (0, 1, 13)]
    rows.append(("junk", bytearray(b"\x00\x00\x00\x20ftypmp42" + bytes(16))))
    df = spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None) for i, p in rows],
        "id string, video binary")
    out = multimodal.video_dhash(df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id["0"]) == 6 and all(r["err"] is None for r in by_id["0"])
    assert by_id["13"][0]["err"] == "null_payload"
    assert by_id["junk"][0]["err"] == "NotImplementedError"  # codec seam
    # frame hashes replay from the raster, never the container
    exp = [dhash_from_array(a) for a in dhash_video_frames(0)]
    got = [r["dhash"] for r in sorted(by_id["0"], key=lambda r: r["frame_idx"])]
    assert got == exp
    assert got[5] == 0                       # the all-zero boilerplate frame


def test_video_near_dup_trios_and_frequency_cap(spark):
    from pyspark.sql import functions as F
    from image_pdf_ocr_suite_spark.analytics import multimodal
    from image_pdf_ocr_suite_spark.fixtures import dhash_video_payload_for
    ids = [i for i in range(12) if dhash_video_payload_for(i) is not None]
    df = spark.createDataFrame(
        [(str(i), bytearray(dhash_video_payload_for(i))) for i in ids],
        "id string, video binary")
    hashes = multimodal.video_dhash(df)
    # capped: only within-trio pairs, >= 3 shared patterned frames
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in multimodal.video_near_dup_pairs(
               hashes, min_shared=2, max_hash_freq=8).collect()}
    assert got and all(int(a) // 3 == int(b) // 3 for a, b in got)
    assert all(n >= 3 for n in got.values())
    # uncapped at min_shared=1: the shared all-zero frame links
    # EVERY video pair — exactly what the boilerplate guard prevents
    uncapped = multimodal.video_near_dup_pairs(
        hashes, min_shared=1, max_hash_freq=None).count()
    n = len(ids)
    assert uncapped == n * (n - 1) // 2
