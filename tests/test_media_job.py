"""media_job CLI: multimodal features to snapshot tables with resume."""

import pytest

from image_pdf_ocr_suite_spark import fixtures
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.media_job import run as run_media_job


@pytest.fixture()
def media_table(spark, tmp_path):
    rows = []
    for i in range(24):
        rows.append((str(i),
                     bytearray(p) if (p := fixtures.image_payload_for(i))
                     else None,
                     bytearray(a) if (a := fixtures.audio_payload_for(i))
                     else None,
                     bytearray(v) if (v := fixtures.video_payload_for(i))
                     else None))
    path = str(tmp_path / "media")
    spark.createDataFrame(
        rows, "id string, image binary, audio binary, video binary") \
        .write.parquet(path)
    return path


def test_media_job_all_kinds(spark, tmp_path, media_table):
    out = str(tmp_path / "out")
    run_media_job(spark, media_table, out, frame_stride=4)
    imgs = SnapshotTable(f"{out}/image_features").read(spark)
    assert imgs.count() == 24
    assert imgs.where("format = 'png' and err is null").count() > 0
    assert imgs.where("format = 'jpg' and err is null").count() > 0
    auds = SnapshotTable(f"{out}/audio_features").read(spark)
    assert auds.count() == 24
    vids = SnapshotTable(f"{out}/video_features").read(spark)
    # SVID clips fan out to 3 sampled frames each; seam/null rows stay 1
    assert vids.where("err is null").count() == \
        12 * 3  # doc_id%4 in (0,1) -> 12 clips
    assert vids.where("err is not null").count() == 12


def test_media_job_resume_skips_committed(spark, tmp_path, media_table):
    out = str(tmp_path / "out")
    run_media_job(spark, media_table, out, kinds=["image"])
    n1 = SnapshotTable(f"{out}/image_features").read(spark).count()
    # resume over the same input: nothing new to process
    run_media_job(spark, media_table, out, kinds=["image"], resume=True)
    n2 = SnapshotTable(f"{out}/image_features").read(spark).count()
    assert n1 == n2 == 24


def test_media_job_rejects_unknown_kind(spark, tmp_path, media_table):
    with pytest.raises(SystemExit):
        run_media_job(spark, media_table, str(tmp_path / "o"),
                      kinds=["hologram"])
