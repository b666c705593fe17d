"""Build the ``spark-submit --py-files`` archive every job's usage
string references::

    python make_pyfiles.py [dest.zip]
    spark-submit --py-files pkg.zip jobs/extract_job.py --input-table ...

The archive carries the whole engine package plus ``jobs/`` as an
importable package (an empty ``jobs/__init__.py`` is injected — the
composed jobs import each other as ``jobs.corpus_job`` etc., and
zipimport only resolves regular packages).  Entries are written in
sorted order with a fixed timestamp so rebuilding an unchanged tree is
byte-identical — a cluster deploy can hash-compare before re-shipping.

North-rule anchor: "ships as a spark-submit --py-files package";
tests/test_pyfiles_submit.py drives a REAL spark-submit against the
archive from outside the repo tree.
"""

from __future__ import annotations

import os
import sys
import zipfile

_FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build_pyfiles(dest: str = "pkg.zip", repo: str | None = None) -> str:
    """Write the --py-files archive; returns ``dest``."""
    repo = repo or os.path.dirname(os.path.abspath(__file__))
    entries: list[tuple[str, str]] = []
    for pkg in ("image_pdf_ocr_suite_spark", "jobs"):
        root = os.path.join(repo, pkg)
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    entries.append(
                        (os.path.relpath(full, repo), full))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        names = {arc for arc, _ in entries}
        if "jobs/__init__.py" not in names:
            info = zipfile.ZipInfo("jobs/__init__.py",
                                   date_time=_FIXED_DATE)
            zf.writestr(info, "")
        for arc, full in sorted(entries):
            info = zipfile.ZipInfo(arc, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return dest


if __name__ == "__main__":
    out = build_pyfiles(sys.argv[1] if len(sys.argv) > 1 else "pkg.zip")
    print(out)
