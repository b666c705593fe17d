"""Model-artifact distribution — E7/E8 generalized (north_star requirement).

The reference resolves a tesseract binary and a CJK font by scanning the
local filesystem, then memoizes in module globals
(/root/reference/image_pdf_ocr/ocr.py:244-355 font, 379-433 engine,
caches at ocr.py:35 and 373).  The distributed analog:

1. the DRIVER resolves/loads the artifact bytes once (traineddata, font
   program, model weights);
2. ships them to executors via ``SparkContext.broadcast`` (or
   ``spark.files`` for >2 GB artifacts);
3. each Python WORKER materializes the bytes to an executor-local file at
   most once per process and memoizes the path — the same role the
   reference's ``_FONT_PATH_CACHE`` global plays, per worker instead of
   per process-global.

Kernels call ``worker_path(bcast, name)`` inside the batch loop; the disk
write happens once per worker, every later batch hits the memo.
"""

from __future__ import annotations

import os
import tempfile

# per-Python-worker memo: name -> materialized path (≈ ocr.py:35 cache)
_WORKER_CACHE: dict[str, str] = {}


def broadcast_artifact(spark, name: str, data: bytes):
    """Driver side: broadcast artifact bytes once (E7/E8 resolve step)."""
    return spark.sparkContext.broadcast({"name": name, "data": data})


def worker_path(bcast, subdir: str = "spark-artifacts") -> str:
    """Executor side: materialize the broadcast artifact to an executor-
    local file once per Python worker; memoized thereafter."""
    meta = bcast.value
    name = meta["name"]
    cached = _WORKER_CACHE.get(name)
    if cached and os.path.exists(cached):
        return cached
    root = os.path.join(tempfile.gettempdir(), subdir, str(os.getpid()))
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(meta["data"])
    os.replace(tmp, path)
    _WORKER_CACHE[name] = path
    return path
