"""spark-submit entry point for the multimodal feature pipeline.

    zip -r pkg.zip image_pdf_ocr_suite_spark/
    spark-submit --py-files pkg.zip jobs/media_job.py \
        --input-table /path/to/media_parquet \
        --output-root /path/to/output \
        --kinds image,audio,video [--resume] [--run-id RID] \
        [--frame-stride 30]

Reads a media table ``(id, image?, audio?, video?)`` (any subset of the
binary columns), runs the real decode kernels (BMP/PPM/PNG/JPEG incl.
progressive, PCM WAV + rFFT spectrum, SVID frame sampling — production
codecs land in the documented seams as err rows, never task failures)
and appends typed feature rows to snapshot-committed tables, one per
modality.  ``--resume`` anti-joins the committed ids of a previous run
(same idempotent-restart contract as jobs/extract_job.py).

On a cluster with an Iceberg catalog, replace SnapshotTable with
``df.writeTo(table).append()`` — the kernel code is unchanged.
"""

from __future__ import annotations

import argparse
import sys
import uuid

from pyspark.sql import SparkSession

from image_pdf_ocr_suite_spark.analytics import multimodal
from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def run(spark: SparkSession, input_table: str, output_root: str,
        kinds: list[str] | None = None, resume: bool = False,
        run_id: str | None = None, frame_stride: int = 30) -> str:
    """Execute the media-feature job on an existing session; returns
    run_id."""
    run_id = run_id or uuid.uuid4().hex[:12]
    kinds = kinds or ["image", "audio", "video"]
    media = spark.read.parquet(input_table)

    ops = {
        "image": lambda df: multimodal.image_features(df),
        "audio": lambda df: multimodal.audio_features(df),
        "audio_spectrum": lambda df: multimodal.audio_spectrum(df),
        "video": lambda df: multimodal.video_frame_features(
            df, every_n=frame_stride),
    }
    col_of = {"image": "image", "audio": "audio",
              "audio_spectrum": "audio", "video": "video"}
    for kind in kinds:
        if kind not in ops:
            raise SystemExit(f"unknown media kind {kind!r} "
                             f"(choose from {sorted(ops)})")
        col = col_of[kind]
        if col not in media.columns:
            raise SystemExit(f"input table has no '{col}' column "
                             f"required by kind {kind!r}")
        table = SnapshotTable(f"{output_root}/{kind}_features")
        df = media.select("id", col)
        if resume:
            df = table.remaining_input(df, "id")
        table.append(ops[kind](df), run_id=f"{run_id}-{kind}")
    return run_id


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--kinds", default="image,audio,video")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--frame-stride", type=int, default=30)
    args = ap.parse_args(argv)
    spark = build_session(app="media_job")
    try:
        rid = run(spark, args.input_table, args.output_root,
                  kinds=[k.strip() for k in args.kinds.split(",") if k],
                  resume=args.resume, run_id=args.run_id,
                  frame_stride=args.frame_stride)
        print(f"run_id={rid}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
