"""The exact Python ``str.isspace()`` character set as a regex class,
spelled with ``\\x{...}`` escapes that Java's Pattern (Spark) and RE2
(DuckDB) both accept — so the SAME pattern string runs in both engines.

Why it exists: Java's ``\\s`` is ASCII-plus-VT, RE2's ``\\s`` is ASCII
minus VT, and Python's ``str.strip()`` / ``str.split()`` use the full
Unicode set (U+3000 ideographic space, NBSP, NEL, ...).  The reference
implementation strips with Python ``str.strip()`` (ocr.py:495, 767, 780),
so the engine's Catalyst strips must use this class, not ``\\s`` — and
every DuckDB oracle that normalizes whitespace must use the identical
class or the cross-engine hash gate breaks the first time a document
contains an ideographic space.

Derived from ``[c for c in range(0x110000) if chr(c).isspace()]``
(CPython 3.11; pinned by tests/test_unicode_and_buckets.py).
"""

UWS = (r"\t\n\x{B}\f\r\x{1C}-\x{1F} \x{85}\x{A0}\x{1680}"
       r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}")

UWS_CLASS = f"[{UWS}]"
STRIP_PATTERN = f"^{UWS_CLASS}+|{UWS_CLASS}+$"
LSTRIP_PATTERN = f"^{UWS_CLASS}+"
RUNS_PATTERN = f"{UWS_CLASS}+"
