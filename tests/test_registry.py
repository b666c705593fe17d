"""Driver-contract registry invariants (__spark_entry__.py): the
CORRECTNESS gate records exactly the first 50 queries() entries, so the
layout rules are load-bearing — pin them.

- every in-window (first-50) entry has an oracle_sql() twin (the gate
  hash-checks them; a rows-only entry in-window wastes a slot),
- every oracle belongs to a registered query and vice versa (only the
  documented rows-only binary sinks may lack oracles),
- entry() stays importable and the flagship query is first.
"""

import __spark_entry__ as em

ROWS_ONLY_ALLOWED = {"searchable_pdf", "images_to_pdf"}


def test_first_50_all_have_oracles():
    q = list(em.queries())
    oracles = em.oracle_sql()
    assert len(q) >= 50
    missing = [k for k in q[:50] if k not in oracles]
    assert missing == [], f"in-window rows without oracle: {missing}"


def test_rows_only_set_is_exactly_the_binary_sinks():
    q = set(em.queries())
    oracles = set(em.oracle_sql())
    assert oracles <= q, f"orphan oracles: {sorted(oracles - q)}"
    assert q - oracles == ROWS_ONLY_ALLOWED


def test_flagship_pins_lead_the_window():
    q = list(em.queries())
    assert q[0] == "ocr_extract_text"
    # round-5p: corpus_clean_verified (the dedup composition whose plan
    # changed in the de-shuffle) holds searchable_pdf_stats' anchor slot
    # so the driver re-verifies the new plan; searchable_pdf_stats is
    # pdfverify-pinned locally and moves to the parity-only region
    assert {"ocr_spans", "html_main_text",
            "corpus_clean_verified"} <= set(q[:6])
    # rotated out for the round-5 new families (driver-green r1-r4,
    # golden parity replicated locally every run) — must stay
    # registered with their golden oracles:
    assert {"ocr_quarantine", "payload_metadata",
            "searchable_pdf_stats"} <= set(q[50:])


def test_new_family_reps_are_in_window():
    q = list(em.queries())
    assert {"sentence_spans", "jsonld_extract", "microdata_extract",
            "section_chunks", "corpus_mixture"} <= set(q[:50])
    # their displaced second representatives stay registered + oracled
    assert {"bpe_encode_stats", "substring_dedup", "dedup_recall_lsh",
            "temperature_sample"} <= set(q[50:])
