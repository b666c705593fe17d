"""Property-based tests (hypothesis) for the round-5j determinism
contracts — pure-Python laws that must hold for ANY input, not just the
curated fixtures (no Spark session needed):

- unigram Viterbi: concatenation identity, non-empty pieces, window
  bound, and idempotent determinism over arbitrary word/score sets;
- unigram replay_train: deterministic, single-char coverage, bounded
  multi-piece count, (count DESC, piece ASC) ranking;
- the global-rank offset arithmetic: prefix sums over arbitrary
  partition-count maps reproduce sorted-enumeration ranks.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from image_pdf_ocr_suite_spark.analytics import unigram

words = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1, max_size=12)
word_freqs = st.dictionaries(words, st.integers(1, 50), max_size=15)
score_maps = st.dictionaries(
    st.text(alphabet="ab", min_size=1, max_size=4),
    st.integers(-10_000_000, -1), max_size=12)


@given(word=st.text(alphabet="ab", min_size=1, max_size=10),
       scores=score_maps, max_len=st.integers(1, 6))
@settings(max_examples=200, deadline=None)
def test_viterbi_laws(word, scores, max_len):
    toks = unigram._viterbi(word, scores, max_len)
    assert "".join(toks) == word                 # concatenation identity
    assert all(toks)                             # no empty piece
    assert all(len(t) <= max_len for t in toks)  # window bound
    assert toks == unigram._viterbi(word, scores, max_len)  # deterministic


@given(wf=word_freqs)
@settings(max_examples=50, deadline=None)
def test_replay_train_laws(wf):
    params = dict(max_len=4, seed_multi=10, target_multi=5, rounds=2)
    tr = unigram.replay_train(wf, **params)
    assert tr == unigram.replay_train(wf, **params)  # deterministic
    pieces = {p for p, _c, _q in tr}
    alphabet = {ch for w in wf if w for ch in w}
    assert alphabet <= pieces                        # coverage
    assert sum(1 for p in pieces if len(p) > 1) <= params["target_multi"]
    ranked = [(-c, p) for p, c, _q in tr]
    assert ranked == sorted(ranked)                  # total ranking
    # every corpus word still segments exactly under the final scores
    scores = {p: q for p, _c, q in tr}
    for w in wf:
        assert "".join(unigram._viterbi(w, scores, params["max_len"])) == w


@given(counts=st.dictionaries(st.integers(0, 20), st.integers(0, 9),
                              min_size=1, max_size=21))
@settings(max_examples=200, deadline=None)
def test_offset_prefix_sum_law(counts):
    # the globalrank pass-2 arithmetic: dense prefix-sum array over
    # (possibly gappy) partition counts == enumeration of the
    # concatenated partitions in pid order
    n_parts = max(counts) + 1
    arr, acc = [], 0
    for pid in range(n_parts):
        arr.append(acc)
        acc += counts.get(pid, 0)
    expect = 0
    for pid in range(n_parts):
        for local in range(counts.get(pid, 0)):
            assert arr[pid] + local == expect
            expect += 1
    assert expect == sum(counts.values())
