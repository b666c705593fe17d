"""Shared scaffolding for the Arrow unique-gram hash kernels
(corpusprep n-gram decontamination, dedup MinHash signatures, text
winnowing — dedup.simhash64 predates it and keeps its row-aligned
pandas_udf shape).

The common shape: flatten each document's gram/shingle list into one
object array, ``pd.factorize`` it, hash each DISTINCT gram once, gather
per occurrence.  ``iter_flat_chunks`` additionally bounds the transient
Python-object footprint: a 10k-row Arrow batch of long documents would
otherwise materialize millions of gram strings (~60+ B object overhead
each) at once — chunking at ``max_items`` grams keeps the worker's peak
memory flat regardless of batch size, at a small cost in per-chunk
factorize dedup factor."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# ~2M gram strings of ~40 B payload + ~60 B object overhead ≈ 200 MB
# transient peak per worker — safe under default executor sizing.
MAX_FLAT_ITEMS = 2_000_000


def iter_flat_chunks(ids: list, gram_lists: list,
                     max_items: int = MAX_FLAT_ITEMS):
    """Yield ``(ids_chunk, lens, flat)`` where ``flat`` concatenates the
    chunk's gram lists and ``sum(lens) <= max_items`` (a single document
    larger than the cap still yields alone)."""
    start = 0
    n = len(ids)
    while start < n:
        end, total = start, 0
        while end < n:
            ln = len(gram_lists[end])
            if end > start and total + ln > max_items:
                break
            total += ln
            end += 1
        lens = np.fromiter((len(g) for g in gram_lists[start:end]),
                           dtype=np.int64, count=end - start)
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for g in gram_lists[start:end]:
            flat[pos:pos + len(g)] = g
            pos += len(g)
        yield ids[start:end], lens, flat
        start = end


def factorize_md5_hex(flat: np.ndarray):
    """``(codes, uhex)``: factorize the flat gram array and md5-hex each
    DISTINCT gram once (the Zipf trick — repeated grams hash once)."""
    codes, uniques = pd.factorize(flat)
    uhex = np.array([hashlib.md5(u.encode()).hexdigest() for u in uniques],
                    dtype=object)
    return codes, uhex
