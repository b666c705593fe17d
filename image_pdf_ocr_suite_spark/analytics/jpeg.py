"""Baseline JPEG (JFIF) codec on stdlib + numpy — public spec only
(ITU-T T.81 / ISO 10918-1; tables from Annex K).

Decoder: baseline sequential DCT (SOF0/SOF1) — single-scan interleaved
AND the legal multi-scan non-interleaved form (one SOS per component
subset, raster block grid per A.2.2, decoded through the same
coefficient store as progressive) — and progressive (SOF2 — spectral
selection + successive approximation, EOB runs, refinement correction
bits), grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
intervals, byte-stuffing.  Arithmetic coding, 12-bit precision and
hierarchical modes stay behind the NotImplementedError codec seam —
exactly the split a production Pillow/libvips binding would replace.

Encoder: the minimal fixture writer (solid colors and small test rasters;
quality expressed directly as quant tables — all-ones tables make the
DCT path lossless up to rounding, which the spec-conformance tests use).

The IDCT is the exact float DCT-III via the orthonormal basis matrix —
no integer fast-IDCT approximations, so decoded values are deterministic
across platforms (numpy float64).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants (ITU-T T.81 Annex K — public tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

# Annex K.3.1/K.3.2: typical huffman tables (BITS, HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis matrix C: X = C @ x @ C.T (forward),
    x = C.T @ X @ C (inverse)."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c

_C = _dct_basis()


# ---------------------------------------------------------------------------
# huffman tables
# ---------------------------------------------------------------------------

def _build_decode_table(bits, vals):
    """code -> (length, value) lookup as dict keyed by (length, code)."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte-stuffing (0xFF 0x00 -> 0xFF) and RST-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                # marker inside entropy data (e.g. EOI reached early) —
                # pad with 1-bits per spec F.2.2.5
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_restart(self):
        """Consume the pending RST marker and realign to a byte."""
        self.acc = 0
        self.n = 0
        while self.data[self.pos] != 0xFF or not (
                0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, idx):
        self.idx = idx


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude value (spec F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF -> HxW uint8 (grayscale) or HxWx3 uint8 RGB.

    Raises ValueError for corrupt/truncated streams (quarantine-safe:
    out-of-range reads surface as ValueError, never IndexError — a
    decode kernel must route bad payloads to an err column, not fail
    the task) and NotImplementedError for the arithmetic/12-bit/
    hierarchical codec seam (baseline AND progressive decode here)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated JPEG stream: {exc}") from exc
    except _RestartMarker as exc:
        raise ValueError("JPEG restart marker out of position") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coef_store = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17:i + 17 + nvals])
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            if w == 0 or h == 0 or w * h > 64_000_000:
                raise ValueError(f"JPEG dimensions {w}x{h} invalid or "
                                 f"beyond the decode kernel's 64 MP bound")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                "decode here; arithmetic/lossless/hierarchical need a "
                "codec binding")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                    # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci, comp = next(
                    (i, x) for i, x in enumerate(frame["comps"])
                    if x["id"] == cs)
                scan.append({**comp, "ci": ci, "dc": tt >> 4,
                             "ac": tt & 0xF})
            if not frame["progressive"]:
                # Fast path: the common single-scan file — one SOS
                # interleaving every frame component (or a 1:1-sampled
                # single-component frame, where the MCU grid and the
                # raster block grid coincide).  Everything else is the
                # legal multi-scan / non-interleaved form (T.81 A.2.2):
                # a single-component scan walks the component's OWN
                # raster block grid, not the MCU grid, so those scans
                # decode at full precision into the same coefficient
                # store the progressive path uses, with one
                # reconstruction at EOI.  (ADVICE r4 flagged the old
                # guard; this closes the seam instead.)
                if ns == len(frame["comps"]) and (
                        ns > 1 or (scan[0]["h"] == 1
                                   and scan[0]["v"] == 1)):
                    return _decode_scan(payload, pos + seglen, frame, scan,
                                        qt, huff_dc, huff_ac,
                                        restart_interval)
                if coef_store is None:
                    coef_store = _prog_init_store(frame)
                pos = _baseline_scan_to_store(
                    payload, pos + seglen, frame, scan, huff_dc, huff_ac,
                    coef_store, restart_interval)
                continue
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coef_store is None:
                coef_store = _prog_init_store(frame)
            pos = _prog_decode_scan(
                payload, pos + seglen, frame, scan, huff_dc, huff_ac,
                coef_store, ss, se, ahal >> 4, ahal & 0xF,
                restart_interval)
            continue
        pos += seglen
    if frame is not None and coef_store is not None:
        # progressive, or baseline multi-scan: one reconstruction at EOI
        return _prog_reconstruct(frame, coef_store, qt)
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.sync_to_restart()
                pred = [0] * len(scan)
            try:
                for ci, c in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(
                                reader, huff_dc[c["dc"]], huff_ac[c["ac"]],
                                qt[c["tq"]], pred, ci)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("JPEG restart marker out of position")
            mcu_count += 1
    return _finish_planes(planes, scan, w, h, hmax, vmax)


def _finish_planes(planes, comps, w, h, hmax, vmax):
    """Shared tail: nearest upsample, crop, (YCbCr->RGB), clamp."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0] + 128.0), 0, 255)
        return out.astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) scans — coefficients accumulate across scans, one
# reconstruction at EOI (spec G.2; the decoder control flow mirrors the
# public successive-approximation algorithm, same structure as libjpeg's
# decode_mcu_DC/AC_first/refine)
# ---------------------------------------------------------------------------

def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _prog_init_store(frame):
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    return [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
            for c in frame["comps"]]


def _comp_block_grid(frame, c):
    """Non-interleaved block grid: the component's OWN size, not the
    MCU-padded grid (spec A.2.2)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _next_marker_pos(data, pos):
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return len(data)


def _prog_decode_scan(data, pos, frame, scan, huff_dc, huff_ac, store,
                      ss, se, ah, al, dri):
    reader = _BitReader(data, pos)
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if ss == 0:                                   # DC scan (interleavable)
        pred = [0] * len(scan)
        units = []                                # (ci, by, bx) per MCU
        if len(scan) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    units.append([(c["ci"], my * c["v"] + by,
                                   mx * c["h"] + bx)
                                  for c in scan
                                  for by in range(c["v"])
                                  for bx in range(c["h"])])
        else:
            bh, bw = _comp_block_grid(frame, scan[0])
            units = [[(scan[0]["ci"], by, bx)]
                     for by in range(bh) for bx in range(bw)]
        pred_of = {c["ci"]: i for i, c in enumerate(scan)}
        for u, blocks in enumerate(units):
            if dri and u and u % dri == 0:
                reader.sync_to_restart()
                pred = [0] * len(scan)
            for ci, by, bx in blocks:
                coefs = store[ci][by, bx]
                if ah == 0:                       # DC first
                    c = next(x for x in scan if x["ci"] == ci)
                    t = _huff_decode(reader, huff_dc[c["dc"]])
                    diff = _extend(reader.read_bits(t), t)
                    pred[pred_of[ci]] += diff
                    coefs[0] = pred[pred_of[ci]] << al
                else:                             # DC refine: one raw bit
                    if reader.read_bit():
                        coefs[0] |= 1 << al
    else:                                         # AC scan: one component
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        c = scan[0]
        bh, bw = _comp_block_grid(frame, c)
        ac_tbl = huff_ac[c["ac"]]
        eobrun = 0
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and unit and unit % dri == 0:
                    reader.sync_to_restart()
                    eobrun = 0
                unit += 1
                coefs = store[c["ci"]][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(reader, ac_tbl, coefs,
                                             ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(reader, ac_tbl, coefs,
                                              ss, se, al, eobrun)
    return _next_marker_pos(data, reader.pos)


def _ac_first_block(reader, ac_tbl, coefs, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16                           # ZRL
                continue
            return (1 << r) + reader.read_bits(r) - 1   # EOBn (this block)
        k += r
        if k > se:
            raise ValueError("progressive AC run past band end")
        coefs[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_tbl, coefs, ss, se, al, eobrun):
    """Successive-approximation AC refinement (spec G.1.2.3): newly
    significant coefficients arrive as run+sign, previously significant
    ones absorb one correction bit each, in position order."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tbl)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + reader.read_bits(r)
                    break                          # EOB covers this block
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if coefs[k] != 0:
                    if reader.read_bit() and (coefs[k] & p1) == 0:
                        coefs[k] += p1 if coefs[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                coefs[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coefs[k] != 0:
                if reader.read_bit() and (coefs[k] & p1) == 0:
                    coefs[k] += p1 if coefs[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _prog_reconstruct(frame, store, qt):
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = []
    for ci, c in enumerate(frame["comps"]):
        coefs = store[ci]
        bh, bw = coefs.shape[:2]
        quant = qt[c["tq"]].astype(np.float64)
        # vectorized: dequant every block, de-zigzag, batch IDCT
        dq = coefs.reshape(-1, 64).astype(np.float64) * quant
        blocks = np.zeros((dq.shape[0], 64))
        blocks[:, ZIGZAG] = dq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C)
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        planes.append(plane)
    return _finish_planes(planes, frame["comps"], frame["w"], frame["h"],
                          hmax, vmax)


def _decode_block_coefs(reader, dc_tbl, ac_tbl, pred, ci):
    """Sequential (baseline) block decode to RAW quantized coefficients
    in zigzag order (spec F.2.2) — dequant/IDCT happen at the caller."""
    coeffs = np.zeros(64, dtype=np.int64)
    t = _huff_decode(reader, dc_tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[ci] += diff
    coeffs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                          # ZRL: sixteen zeros
                k += 16
                continue
            break                                # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        coeffs[k] = _extend(reader.read_bits(s), s)
        k += 1
    return coeffs


def _decode_block(reader, dc_tbl, ac_tbl, quant, pred, ci):
    coeffs = _decode_block_coefs(reader, dc_tbl, ac_tbl, pred, ci)
    dq = (coeffs * quant).astype(np.float64)
    block = np.zeros((8, 8))
    block.flat[ZIGZAG] = dq                      # de-zigzag
    return _C.T @ block @ _C                     # exact float IDCT


def _baseline_scan_to_store(data, pos, frame, scan, huff_dc, huff_ac,
                            store, dri):
    """One baseline scan of a multi-scan file decoded at full precision
    into the progressive-style coefficient store.  Unit order per T.81
    A.2: the frame's MCU grid when the scan interleaves several
    components, the component's OWN raster block grid when it has one
    (sampling factors then only size the component, A.2.2).  Returns the
    position of the next marker; reconstruction happens once at EOI."""
    reader = _BitReader(data, pos)
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if len(scan) > 1:
        units = [[(c, my * c["v"] + by, mx * c["h"] + bx)
                  for c in scan
                  for by in range(c["v"])
                  for bx in range(c["h"])]
                 for my in range(mcuy) for mx in range(mcux)]
    else:
        bh, bw = _comp_block_grid(frame, scan[0])
        units = [[(scan[0], by, bx)]
                 for by in range(bh) for bx in range(bw)]
    pred = [0] * len(scan)
    pred_of = {c["ci"]: i for i, c in enumerate(scan)}
    for u, blocks in enumerate(units):
        if dri and u and u % dri == 0:
            reader.sync_to_restart()
            pred = [0] * len(scan)
        try:
            for c, by, bx in blocks:
                store[c["ci"]][by, bx] = _decode_block_coefs(
                    reader, huff_dc[c["dc"]], huff_ac[c["ac"]],
                    pred, pred_of[c["ci"]])
        except _RestartMarker:
            raise ValueError("JPEG restart marker out of position")
    return _next_marker_pos(data, reader.pos)


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:             # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _encode_block(writer, block, quant, pred, ci, dc_enc, ac_enc):
    dct = _C @ block @ _C.T
    zz = dct.flat[ZIGZAG]
    q = np.round(zz / quant).astype(np.int32)
    diff = int(q[0]) - pred[ci]
    pred[ci] = int(q[0])
    t = int(abs(diff)).bit_length()
    code, length = dc_enc[t]
    writer.write(code, length)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        writer.write(v, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if q[k]], default=0)
    for k in range(1, last_nz + 1):
        if q[k] == 0:
            run += 1
            if run == 16:
                code, length = ac_enc[0xF0]      # ZRL
                writer.write(code, length)
                run = 0
            continue
        s = int(abs(int(q[k]))).bit_length()
        code, length = ac_enc[(run << 4) | s]
        writer.write(code, length)
        v = int(q[k]) if q[k] > 0 else int(q[k]) + (1 << s) - 1
        writer.write(v, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]              # EOB
        writer.write(code, length)


def encode_jpeg(arr: np.ndarray, quant_luma: int = 1, quant_chroma: int = 1,
                subsample=False, restart_interval: int = 0,
                interleaved: bool = True) -> bytes:
    """Minimal baseline encoder for fixtures/tests: grayscale (HxW) or
    RGB (HxWx3), flat quant tables (value ``quant_*`` everywhere — 1 =
    lossless up to DCT rounding), optional 4:2:0 subsampling and DRI
    restart markers.  Standard Annex-K huffman tables.
    ``interleaved=False`` emits the legal multi-scan form: one SOS per
    component, blocks in the component's own raster grid (T.81 A.2.2)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr - 128.0]
        samp = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b)
        comps = [y - 128.0, cb, cr]
        # subsample: False = 4:4:4, True/"h2v2" = 4:2:0, "h2v1" = 4:2:2
        luma = {False: (1, 1), True: (2, 2),
                "h2v2": (2, 2), "h2v1": (2, 1)}[subsample]
        samp = [luma, (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad + (for subsampled chroma) box-average reduce
    planes = []
    for ci, c in enumerate(comps):
        sh, sv = samp[ci]
        if (sh, sv) != (hmax, vmax):
            ry, rx = vmax // sv, hmax // sh
            ph, pw = mcuy * 8 * sv * ry, mcux * 8 * sh * rx
            p = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            p = p.reshape(p.shape[0] // ry, ry, p.shape[1] // rx, rx) \
                 .mean(axis=(1, 3))
        else:
            ph, pw = mcuy * 8 * sv, mcux * 8 * sh
            p = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
        planes.append(p)
    # zigzag-ordered quant tables: _encode_block divides the zigzag-order
    # coefficient vector and the DQT segment stores the same order (flat
    # fixture tables make this moot, but keep the spec shape)
    ql = np.full(64, quant_luma, dtype=np.int32)
    qc = np.full(64, quant_chroma, dtype=np.int32)
    dc_l = _build_encode_table(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_encode_table(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_encode_table(DC_CHR_BITS, DC_CHR_VALS)
    ac_c = _build_encode_table(AC_CHR_BITS, AC_CHR_VALS)

    nc_total = len(comps)
    scans = []                                   # (sos_body, entropy bytes)
    if interleaved:
        writer = _BitWriter()
        pred = [0] * nc_total
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    pred = [0] * nc_total
                for ci, p in enumerate(planes):
                    sh, sv = samp[ci]
                    quant = ql if ci == 0 else qc
                    dce = dc_l if ci == 0 else dc_c
                    ace = ac_l if ci == 0 else ac_c
                    for by in range(sv):
                        for bx in range(sh):
                            y0 = (my * sv + by) * 8
                            x0 = (mx * sh + bx) * 8
                            _encode_block(writer, p[y0:y0 + 8, x0:x0 + 8],
                                          quant, pred, ci, dce, ace)
                mcu_count += 1
        writer.flush()
        sos = bytes([nc_total])
        for ci in range(nc_total):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        scans.append((sos, bytes(writer.out)))
    else:
        # non-interleaved: one scan per component, raster block grid
        # sized by the component's true dimensions (T.81 A.2.2) — the
        # MCU-padded plane may carry extra pad blocks that are NOT coded
        for ci, p in enumerate(planes):
            sh, sv = samp[ci]
            cw = (w * sh + hmax - 1) // hmax
            ch = (h * sv + vmax - 1) // vmax
            bh, bw = (ch + 7) // 8, (cw + 7) // 8
            quant = ql if ci == 0 else qc
            dce = dc_l if ci == 0 else dc_c
            ace = ac_l if ci == 0 else ac_c
            writer = _BitWriter()
            pred = [0] * nc_total
            cnt = 0
            rst = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and cnt and \
                            cnt % restart_interval == 0:
                        writer.flush()
                        writer.out += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                        pred = [0] * nc_total
                    _encode_block(writer,
                                  p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                                  quant, pred, ci, dce, ace)
                    cnt += 1
            writer.flush()
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0])
            scans.append((sos, bytes(writer.out)))

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc))
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        out += dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for sos_body, entropy in scans:
        out += seg(0xDA, sos_body)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(arr: np.ndarray, quant_luma: int = 1,
                            quant_chroma: int = 1) -> bytes:
    """Progressive (SOF2) fixture encoder: grayscale or RGB 4:4:4, scan
    script = interleaved DC first (Al=1) + DC refinement, then per
    component AC 1-63 first (Al=1) + AC successive-approximation
    refinement — exercising every progressive decode path (EOB runs,
    ZRL-with-corrections, newly-significant runs, correction bits).
    Flat quant tables; coefficient reconstruction is exact, so decoding
    a progressive stream must equal decoding the baseline stream of the
    same raster bit-for-bit (pytest-pinned)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr - 128.0]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b)
        comps = [y - 128.0, cb, cr]
    nc = len(comps)
    bh_, bw_ = (h + 7) // 8, (w + 7) // 8
    ql = np.full(64, quant_luma, dtype=np.int64)
    qc = np.full(64, quant_chroma, dtype=np.int64)
    T = []
    for ci, c in enumerate(comps):
        p = np.pad(c, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)), mode="edge")
        quant = ql if ci == 0 else qc
        t = np.zeros((bh_, bw_, 64), dtype=np.int64)
        for by in range(bh_):
            for bx in range(bw_):
                d = _C @ p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ _C.T
                t[by, bx] = np.round(d.flat[ZIGZAG] / quant)
        T.append(t)

    dc_l = _build_encode_table(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_encode_table(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_encode_table(DC_CHR_BITS, DC_CHR_VALS)
    ac_c = _build_encode_table(AC_CHR_BITS, AC_CHR_VALS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_specs, ss, se, ah, al):
        body = bytes([len(comp_specs)])
        for cid, dct, act in comp_specs:
            body += bytes([cid, (dct << 4) | act])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)                         # SOF2: progressive

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        out += dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)

    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)
                 for ci in range(nc)]

    # --- scan 1: DC first, interleaved, Al=1 (arithmetic point shift) ---
    out += sos(all_comps, 0, 0, 0, 1)
    wtr = _BitWriter()
    pred = [0] * nc
    for by in range(bh_):
        for bx in range(bw_):
            for ci in range(nc):
                v = int(T[ci][by, bx, 0]) >> 1
                diff = v - pred[ci]
                pred[ci] = v
                t_ = int(abs(diff)).bit_length()
                code, length = (dc_l if ci == 0 else dc_c)[t_]
                wtr.write(code, length)
                if t_:
                    wtr.write(diff if diff > 0 else diff + (1 << t_) - 1, t_)
    wtr.flush()
    out += wtr.out

    # --- scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits) ---
    out += sos(all_comps, 0, 0, 1, 0)
    wtr = _BitWriter()
    for by in range(bh_):
        for bx in range(bw_):
            for ci in range(nc):
                wtr.write(int(T[ci][by, bx, 0]) & 1, 1)
    wtr.flush()
    out += wtr.out

    # --- per component: AC first (Al=1) then AC refinement (Ah=1 Al=0) ---
    for ci in range(nc):
        enc = ac_l if ci == 0 else ac_c
        cspec = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)]
        out += sos(cspec, 1, 63, 0, 1)
        wtr = _BitWriter()
        for by in range(bh_):
            for bx in range(bw_):
                tt = T[ci][by, bx]
                sh = [0] * 64
                for k in range(1, 64):
                    v = int(tt[k])
                    sh[k] = (1 if v > 0 else -1) * (abs(v) >> 1)
                last = max([k for k in range(1, 64) if sh[k]], default=0)
                run = 0
                for k in range(1, last + 1):
                    v = sh[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc[0xF0]
                        wtr.write(code, length)
                        run -= 16
                    s = int(abs(v)).bit_length()
                    code, length = enc[(run << 4) | s]
                    wtr.write(code, length)
                    wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, length = enc[0x00]      # EOB, run of 1
                    wtr.write(code, length)
        wtr.flush()
        out += wtr.out

        out += sos(cspec, 1, 63, 1, 0)
        wtr = _BitWriter()
        for by in range(bh_):
            for bx in range(bw_):
                tt = T[ci][by, bx]
                absv = [abs(int(tt[k])) for k in range(64)]
                newly = [k for k in range(1, 64) if absv[k] == 1]
                k, run, pending = 1, 0, []
                for nk in newly:
                    while k < nk:
                        if absv[k] >> 1:          # previously significant
                            pending.append(absv[k] & 1)
                        elif absv[k] == 0:        # zero history
                            run += 1
                            if run == 16:
                                code, length = enc[0xF0]
                                wtr.write(code, length)
                                for bit in pending:
                                    wtr.write(bit, 1)
                                pending, run = [], 0
                        k += 1
                    code, length = enc[(run << 4) | 1]
                    wtr.write(code, length)
                    wtr.write(1 if int(tt[nk]) > 0 else 0, 1)
                    for bit in pending:
                        wtr.write(bit, 1)
                    pending, run = [], 0
                    k = nk + 1
                if k < 64:
                    rest = [absv[j] & 1 for j in range(k, 64)
                            if absv[j] >> 1]
                    code, length = enc[0x00]      # EOB + corrections
                    wtr.write(code, length)
                    for bit in rest:
                        wtr.write(bit, 1)
        wtr.flush()
        out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)
