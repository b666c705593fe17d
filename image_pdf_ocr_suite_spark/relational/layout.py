"""Reading-order reconstruction from raw layout boxes (north_rule).

The reference's OCR emits an explicit (block, par, line, word) hierarchy,
so reading order is a plain sort (SURVEY §2.2).  When layout comes as BARE
BOXES (PDF text extraction, generic layout models), order must be
reconstructed geometrically: cluster boxes into lines by vertical overlap,
then read lines top-to-bottom and words left-to-right.

Line clustering is a windowed gap-scan (pure Catalyst): sort boxes by top;
a new line starts where the vertical gap to the previous box exceeds
``line_tol`` × box height; line id = running sum of line-starts.  This is
the standard XY-cut first phase, expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def reconstruct_reading_order(boxes: DataFrame, doc_col: str = "url",
                              page_col: str = "page", line_tol: float = 0.6) -> DataFrame:
    """boxes(doc, page, left, top, width, height, text) ->
    + (line_id, order_in_line, reading_rank).

    Deterministic: ties break on (top, left, text)."""
    by_top = Window.partitionBy(doc_col, page_col) \
        .orderBy("top", "left", "text")
    prev_top = F.lag("top").over(by_top)
    prev_h = F.lag("height").over(by_top)
    new_line = F.when(
        prev_top.isNull() |
        ((F.col("top") - prev_top) > line_tol * F.least(F.col("height"), prev_h)),
        1).otherwise(0)
    lined = boxes.withColumn("__new_line", new_line).withColumn(
        "line_id",
        F.sum("__new_line").over(
            by_top.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_line")
    in_line = Window.partitionBy(doc_col, page_col, "line_id") \
        .orderBy("left", "top", "text")
    full = Window.partitionBy(doc_col, page_col) \
        .orderBy("line_id", F.col("left"), "top", "text")
    return lined.withColumn("order_in_line", F.row_number().over(in_line)) \
                .withColumn("reading_rank", F.row_number().over(full))


def page_text_from_boxes(boxes: DataFrame, doc_col: str = "url",
                         page_col: str = "page", line_tol: float = 0.6) -> DataFrame:
    """Assemble page text purely from geometry: words joined by spaces
    within a line, lines by newlines."""
    ordered = reconstruct_reading_order(boxes, doc_col, page_col, line_tol)
    lines = ordered.groupBy(doc_col, page_col, "line_id").agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("order_in_line", "text"))),
            lambda x: x["text"])).alias("line_text"))
    return lines.groupBy(doc_col, page_col).agg(
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(F.struct("line_id", "line_text"))),
            lambda x: x["line_text"])).alias("page_text"))
