"""Adaptive-OCR page kernel — the heavy stage.

Arrow-batched ``mapInPandas`` over per-page rows ``(url, page, n_pages,
page_payload)``.  Semantics = the reference's per-page loop (ocr.py:760-766)
and adaptive two-pass OCR (ocr.py:48-79), but batch-VECTORIZED:

1. decode + rasterize + base OCR per page (binary parse and raster synthesis
   are inherently per-document, like any image decode);
2. ALL confidence math runs once over the batch-wide concatenated word
   frame: per-page average confidence via groupby (= _compute_average_
   confidence, ocr.py:90-102, incl. 0.0-if-no-valid-rows);
3. the preprocess+re-OCR second pass runs ONLY on the low-confidence subset
   (mask, not branch-per-row) — the reference's early exit (ocr.py:63-64)
   as a vectorized filter;
4. winner selection is strictly-greater (ties keep base, ocr.py:71);
   winner boxes are rescaled by 1/upscale (= _prepare_frame, ocr.py:114-117);
5. per-word character offsets into the page text are a vectorized
   shift/cumsum — no iterrows anywhere (the reference's per-row loops at
   ocr.py:494/678 are exactly what this kernel replaces).

Output: one row per page with the page text (``ocr_text`` on the winner
image — the reference's SECOND engine call, image_to_string at ocr.py:766),
adaptive metadata, and the winner word boxes as an array<struct>.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from image_pdf_ocr_suite_spark import backends
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig

WORD_STRUCT = (
    "block int, par int, line int, word int, "
    "left double, top double, width double, height double, "
    "conf double, text string, off bigint, legible boolean"
)

OCR_SCHEMA = (
    "url string, page int, n_pages int, page_text string, "
    "avg_conf double, used_preprocessing boolean, "
    "n_valid_words bigint, sum_valid_conf double, "
    f"words array<struct<{WORD_STRUCT}>>, pid int"
)


def _avg_conf_per_page(frame: pd.DataFrame, n: int) -> np.ndarray:
    """Vectorized _compute_average_confidence (ocr.py:90-102) over a
    concatenated multi-page frame keyed by ``idx``: mean of conf>=0 per
    page, 0.0 where no valid rows."""
    conf = pd.to_numeric(frame["conf"], errors="coerce")
    valid = frame.loc[conf.notna() & (conf >= 0), ["idx"]].assign(conf=conf)
    means = valid.groupby("idx")["conf"].mean()
    out = np.zeros(n, dtype=np.float64)
    out[means.index.to_numpy()] = means.to_numpy()
    return out


def _concat_frames(frames: list[pd.DataFrame], idxs: list[int]) -> pd.DataFrame:
    parts = []
    for i, f in zip(idxs, frames):
        g = f.copy()
        g["idx"] = i
        parts.append(g)
    if not parts:
        return pd.DataFrame(columns=backends.TSV_COLUMNS + ["idx"])
    return pd.concat(parts, ignore_index=True)


def _word_offsets(words: pd.DataFrame, lead_ws: np.ndarray) -> pd.DataFrame:
    """Character offset of each legible word within strip(page_text),
    given ocr_text's join rules (" " within line, "\\n" within block,
    "\\n\\n" between blocks).  ``lead_ws[idx]`` is the leading-whitespace
    length the page-level strip removes (non-zero when the first legible
    word is itself whitespace).  Pure shift/cumsum — no row loop."""
    words = words.copy()
    words["legible"] = words["text"].notna() & (words["conf"] >= backends.LEGIBILITY_FLOOR)
    words["off"] = -1
    leg = words[words["legible"]]
    if len(leg):
        g = leg.groupby("idx")
        pb = g["block_num"].shift()
        pp = g["par_num"].shift()
        pl = g["line_num"].shift()
        first = pb.isna()
        same_line = (leg["block_num"] == pb) & (leg["par_num"] == pp) & (leg["line_num"] == pl)
        same_block = leg["block_num"] == pb
        sep = np.where(first, 0, np.where(same_line | same_block, 1, 2))
        tlen = leg["text"].str.len()
        prev_len = tlen.groupby(leg["idx"]).shift().fillna(0).astype(np.int64)
        off = (prev_len + sep).groupby(leg["idx"]).cumsum()
        words.loc[leg.index, "off"] = off - lead_ws[leg["idx"].to_numpy()]
    return words


def make_ocr_kernel(cfg: ExtractConfig):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # 1. per-page decode + raster + base OCR (inherently per payload)
            pages = [spdf.decode(bytes(pb)).pages[0] for pb in pdf["page_payload"]]
            images = [backends.rasterize(p) for p in pages]
            base = _concat_frames([backends.ocr_boxes(im) for im in images], list(range(n)))

            # 2. vectorized per-page average confidence
            base_avg = _avg_conf_per_page(base, n)

            # 3. second pass only on the low-confidence subset (ocr.py:63-64)
            low = np.flatnonzero(base_avg < cfg.adaptive_conf_threshold)
            pre_imgs: dict[int, backends.FakeImage] = {}
            if len(low):
                for i in low:
                    pre_imgs[i], _ = backends.preprocess(
                        images[i], cfg.upscale_factor, cfg.binarize_threshold)
                pre = _concat_frames([backends.ocr_boxes(pre_imgs[i]) for i in low], list(low))
                pre_avg_low = _avg_conf_per_page(pre, n)[low]
            else:
                pre = _concat_frames([], [])
                pre_avg_low = np.array([])

            # 4. strictly-greater winner selection (ocr.py:71)
            use_pre = np.zeros(n, dtype=bool)
            use_pre[low] = pre_avg_low > base_avg[low]
            avg = np.where(use_pre, 0.0, base_avg)
            if len(low):
                tmp = np.zeros(n); tmp[low] = pre_avg_low
                avg = np.where(use_pre, tmp, base_avg)

            # winner frame = base rows for base pages, rescaled pre rows for
            # pre winners (÷ upscale = _prepare_frame, ocr.py:114-117)
            keep_base = base[~use_pre[base["idx"].to_numpy()]]
            if len(pre):
                keep_pre = pre[use_pre[pre["idx"].to_numpy()]].copy()
                for c in ("left", "top", "width", "height"):
                    keep_pre[c] = keep_pre[c] / cfg.upscale_factor
                winner = pd.concat([keep_base, keep_pre], ignore_index=True)
            else:
                winner = keep_base

            # per-page valid-conf stats for the lineage/metrics table
            wconf = pd.to_numeric(winner["conf"], errors="coerce")
            vmask = wconf.notna() & (wconf >= 0)
            vstats = winner.loc[vmask, ["idx"]].assign(conf=wconf[vmask]).groupby("idx")["conf"]
            v_n = np.zeros(n, dtype=np.int64)
            v_sum = np.zeros(n, dtype=np.float64)
            if vmask.any():
                cnt = vstats.count(); sm = vstats.sum()
                v_n[cnt.index.to_numpy()] = cnt.to_numpy()
                v_sum[sm.index.to_numpy()] = sm.to_numpy()

            # page text = second engine call on the winner image (ocr.py:766)
            texts = [backends.ocr_text(pre_imgs[i] if use_pre[i] else images[i])
                     for i in range(n)]
            lead_ws = np.array([len(t) - len(t.lstrip()) for t in texts], dtype=np.int64)

            # 5. word rows + vectorized offsets
            w = winner[winner["level"] == 5].copy()
            w = _word_offsets(w, lead_ws)
            w = w.rename(columns={"block_num": "block", "par_num": "par",
                                  "line_num": "line", "word_num": "word"})
            wcols = ["block", "par", "line", "word", "left", "top", "width",
                     "height", "conf", "text", "off", "legible"]
            word_lists: list[list[dict]] = [[] for _ in range(n)]
            for i, recs in w.groupby("idx")[wcols].apply(
                    lambda x: x.to_dict("records")).items():
                word_lists[i] = recs

            yield pd.DataFrame({
                "url": pdf["url"].to_numpy(),
                "page": pdf["page"].to_numpy(),
                "n_pages": pdf["n_pages"].to_numpy(),
                "page_text": texts,
                "avg_conf": avg,
                "used_preprocessing": use_pre,
                "n_valid_words": v_n,
                "sum_valid_conf": v_sum,
                "words": word_lists,
                "pid": pid,
            })

    return kernel


def ocr_pages(page_df, cfg: ExtractConfig):
    """Per-page rows -> OCR result rows."""
    return page_df.select("url", "page", "n_pages", "page_payload").mapInPandas(
        make_ocr_kernel(cfg), schema=OCR_SCHEMA)
