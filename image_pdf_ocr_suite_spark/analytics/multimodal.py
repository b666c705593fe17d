"""Multimodal column handling — opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
extracted by Arrow-batched ``mapInPandas`` kernels.  Image decode is REAL
for uncompressed BMP, binary PPM/PGM, 8-bit PNG (stdlib zlib +
per-scanline unfiltering, Adam7 de-interlacing, 8/16-bit) and JPEG —
baseline and progressive (full T.81 decoder, analytics/jpeg.py);
WebP/AVIF and video frame sampling stay behind a clearly-marked
``NotImplementedError`` seam where production binds
Pillow/libvips/ffmpeg.  The Spark-side plumbing — schema, batch shape,
partitioning, UDF signature — is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from image_pdf_ocr_suite_spark import payload as spdf

META_SCHEMA = ("url string, kind string, n_pages int, max_width int, "
               "max_height int, n_words bigint, payload_bytes bigint")


def _meta_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, raw in zip(pdf["url"], pdf["html"]):
            raw = bytes(raw) if raw is not None else b""
            kind = spdf.sniff(raw)
            n_pages = mw = mh = nw = 0
            if kind == "spdf" and not (len(raw) > 5 and raw[5] & spdf.FLAG_ENCRYPTED):
                try:
                    doc = spdf.decode(raw)
                    n_pages = len(doc.pages)
                    # max-extent aggregate (≈ _determine_canvas_size,
                    # /root/reference/image_pdf_ocr/ocr.py:536-558)
                    mw = max((p.width_px for p in doc.pages), default=0)
                    mh = max((p.height_px for p in doc.pages), default=0)
                    nw = sum(len(p.words) for p in doc.pages)
                except spdf.PayloadError:
                    kind = "corrupt"
            rows.append((url, kind, n_pages, mw, mh, nw, len(raw)))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "url", "kind", "n_pages", "max_width", "max_height",
                "n_words", "payload_bytes"])


def payload_metadata(df):
    """(url, html) -> typed payload metadata; real plumbing over the
    deterministic container."""
    return df.select("url", "html").mapInPandas(_meta_kernel, schema=META_SCHEMA)


def _decode_bmp(payload: bytes):
    """Uncompressed BI_RGB BMP (24/32-bit) -> HxWx3 uint8 RGB numpy array.
    Dependency-free: header fields per the Windows BITMAPINFOHEADER layout;
    rows are 4-byte aligned, stored bottom-up (positive height), BGR."""
    import struct

    import numpy as np
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BI_RGB BMPs decode without codec "
            f"libraries (got bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    stride = ((nch * width + 3) // 4) * 4
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * height, offset=data_off)
    rows = rows.reshape(height, stride)[:, : nch * width] \
               .reshape(height, width, nch)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., 2::-1].copy()  # BGR(A) -> RGB


def _decode_ppm(payload: bytes):
    """Binary PPM (P6, RGB) / PGM (P5, grayscale); 16-bit maxvals decode
    via the big-endian high byte (standard 8-bit presentation)."""
    import numpy as np
    magic = payload[:2]
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":                   # comment to EOL
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    # The PNM spec mandates EXACTLY ONE whitespace byte after maxval; a
    # CRLF-terminated header would silently shift the pixel data by one
    # byte, so reject it instead of decoding garbage.
    if not payload[i:i + 1].isspace():
        raise ValueError("malformed PNM header: maxval not terminated")
    if payload[i:i + 1] == b"\r":
        raise ValueError(
            "non-conformant PNM header: CRLF after maxval (spec requires a "
            "single whitespace byte before pixel data)")
    i += 1                                             # single ws after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0 or maxval <= 0:
        raise ValueError(f"invalid PNM dimensions {width}x{height}/{maxval}")
    if maxval > 65535:
        raise ValueError(f"invalid PNM maxval {maxval}")
    nch = 3 if magic == b"P6" else 1
    if maxval > 255:                          # 16-bit: big-endian samples
        raw = np.frombuffer(payload, dtype=">u2",
                            count=width * height * nch, offset=i)
        # scale to the 8-bit view by maxval (ADVICE r4: the raw high byte
        # is only correct for maxval=65535 — for e.g. maxval=1023 a sample
        # of 999 would read as 3); round-half-up like the other kernels
        arr = ((raw.astype(np.float64) * 255.0 / maxval) + 0.5) \
            .astype(np.uint8)
    else:
        arr = np.frombuffer(payload, dtype=np.uint8,
                            count=width * height * nch, offset=i)
        if maxval != 255:                     # sub-255 maxval: same scaling
            arr = ((arr.astype(np.float64) * 255.0 / maxval) + 0.5) \
                .astype(np.uint8)
    return arr.reshape(height, width, 3).copy() if nch == 3 \
        else arr.reshape(height, width).copy()


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Adam7 interlace passes: (x-offset, y-offset, x-stride, y-stride)
ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw, h: int, stride: int, bpp: int):
    """Reverse the per-scanline PNG filters (spec §9: None/Sub/Up/Average/
    Paeth).  Up/None are vectorized; Sub/Average/Paeth carry a left-pixel
    dependency so they walk the scanline — fine for a decode kernel that
    is per-payload Python already."""
    import numpy as np
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int32)
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        prior = out[y - 1] if y else zero
        if f == 0:
            res = cur
        elif f == 2:                                   # Up
            res = (cur + prior) & 0xFF
        elif f == 1:                                   # Sub
            res = cur
            for x in range(bpp, stride):
                res[x] = (res[x] + res[x - bpp]) & 0xFF
        elif f == 3:                                   # Average
            res = cur
            for x in range(stride):
                left = res[x - bpp] if x >= bpp else 0
                res[x] = (res[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:                                   # Paeth
            res = cur
            for x in range(stride):
                a = res[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                res[x] = (res[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = res
    return out.astype(np.uint8)


def _decode_png(payload: bytes):
    """PNG decode on the stdlib only (public spec, RFC 2083 / ISO 15948):
    chunk walk with CRC verification, zlib inflate, per-scanline
    unfiltering, palette expansion, Adam7 de-interlacing (each pass an
    independently-filtered sub-image scattered back by the spec's
    offsets/strides).  Supports bit depths 8 and 16 (16-bit presents
    the high byte — the standard 8-bit view), color types 0/2/3/4/6."""
    import struct
    import zlib as _z

    import numpy as np
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 12 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if _z.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w <= 0 or h <= 0 or comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG header {w}x{h}/{comp}/{filt}")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(f"only 8/16-bit PNG decodes here "
                                  f"(got depth={depth})")
    if depth == 16 and color == 3:
        raise ValueError("PNG palette entries are always 8-bit")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None:
        raise ValueError(f"invalid PNG color type {color}")
    if w * h > 64_000_000:
        raise ValueError(f"PNG dimensions {w}x{h} exceed the decode "
                         f"kernel's 64 MP bound")
    sampw = depth // 8                                 # bytes per sample
    stride = w * nch * sampw
    if interlace == 0:
        expected = h * (stride + 1)
    else:
        # Adam7: each pass is an independently-filtered sub-image
        expected = sum(
            ((w - x0 + dx - 1) // dx * nch * sampw + 1)
            * ((h - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in ADAM7
            if (w - x0 + dx - 1) // dx > 0 and (h - y0 + dy - 1) // dy > 0)
    try:
        # bounded inflate: a crafted stream must not expand past the
        # header-declared size (zip-bomb guard for untrusted crawl data)
        d = _z.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except _z.error as exc:
        raise ValueError(f"corrupt PNG pixel stream: {exc}") from exc
    if len(raw) != expected:
        raise ValueError("PNG pixel data length mismatch")
    if interlace == 0:
        arr = _png_unfilter(raw, h, stride, nch * sampw)
        if depth == 16:
            # high byte == value >> 8: the standard 8-bit presentation
            arr = arr.reshape(h, w * nch, 2)[:, :, 0].copy()
    else:
        import numpy as np
        full = np.zeros((h, w * nch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * nch * sampw
            size = ph * (pstride + 1)
            sub = _png_unfilter(raw[off:off + size], ph, pstride,
                                nch * sampw)
            off += size
            if depth == 16:
                sub = sub.reshape(ph, pw * nch, 2)[:, :, 0]
            sub = sub.reshape(ph, pw, nch)
            ys = np.arange(y0, h, dy)
            xs = np.arange(x0, w, dx)
            view = full.reshape(h, w, nch)
            view[np.ix_(ys, xs)] = sub
        arr = full
    if color == 3:                                     # palette -> RGB
        if plte is None or len(plte) % 3:
            raise ValueError("paletted PNG without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr.reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx].copy()
    if nch == 1:
        return arr.reshape(h, w).copy()
    return arr.reshape(h, w, nch).copy()


def decode_image(payload: bytes):
    """Image decode without codec libraries: dependency-free BMP
    (24/32-bit BI_RGB), binary PPM/PGM, 8-bit PNG (stdlib zlib +
    unfiltering), and JPEG — baseline AND progressive
    (full T.81 decoder: huffman, successive approximation, dequant,
    exact-float IDCT, 4:2:0/4:2:2 upsampling, restart intervals —
    analytics/jpeg.py); anything else (WebP, AVIF, ...) needs a Pillow/libvips binding — that seam
    raises NotImplementedError so production can plug the real codec
    in."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if payload[:8] == PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from image_pdf_ocr_suite_spark.analytics.jpeg import decode_jpeg
        return decode_jpeg(payload)
    raise NotImplementedError(
        "WebP/AVIF/... decoding needs codec libraries not available in "
        "this environment; bind Pillow/libvips here in production "
        "(BMP, PPM/PGM, 8-bit PNG and baseline JPEG decode natively)")


IMAGE_FEATURES_SCHEMA = ("id string, format string, width int, height int, "
                         "channels int, mean_lum double, err string")


def image_features(df, image_col: str = "image", id_col: str = "id"):
    """(id, image binary) -> decoded image features via an Arrow-batched
    mapInPandas kernel: format, dimensions, channel count, mean luminance
    (ITU-R 601 on RGB).  Undecodable payloads report err instead of
    failing the task — the quarantine contract."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["image"]):
                if raw is None:
                    rows.append((rid, "none", 0, 0, 0, 0.0, "null_payload"))
                    continue
                raw = bytes(raw)
                fmt = ("bmp" if raw[:2] == b"BM"
                       else "ppm" if raw[:2] == b"P6"
                       else "pgm" if raw[:2] == b"P5"
                       else "png" if raw[:8] == PNG_MAGIC
                       else "jpg" if raw[:3] == b"\xff\xd8\xff"
                       else "webp" if (raw[:4] == b"RIFF"
                                       and raw[8:12] == b"WEBP")
                       else "unknown")
                try:
                    arr = decode_image(raw)
                except (NotImplementedError, ValueError) as e:
                    rows.append((rid, fmt, 0, 0, 0, 0.0, type(e).__name__))
                    continue
                if arr.ndim == 3 and arr.shape[2] >= 3:
                    a = arr.astype(np.float64)
                    lum = (a[..., 0] * 0.299 + a[..., 1] * 0.587
                           + a[..., 2] * 0.114).mean()
                    ch = arr.shape[2]
                elif arr.ndim == 3:                     # gray+alpha
                    lum = float(arr[..., 0].astype(np.float64).mean())
                    ch = arr.shape[2]
                else:
                    lum = float(arr.astype(np.float64).mean())
                    ch = 1
                rows.append((rid, fmt, arr.shape[1], arr.shape[0], ch,
                             float(lum), None))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "id", "format", "width", "height", "channels",
                    "mean_lum", "err"])

    return df.select(df[id_col].cast("string").alias("id"),
                     df[image_col].alias("image")) \
             .mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM parse without codec libraries: walks the chunk list,
    reads the fmt header (PCM16/PCM8 only) and returns
    (sample_rate, n_channels, samples) with samples as float64 in [-1, 1),
    shape (n_frames, n_channels)."""
    import struct

    import numpy as np
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:                # truncated header: quarantine,
                raise ValueError("truncated fmt chunk")  # not struct.error
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if n_ch <= 0:
        raise ValueError("invalid channel count 0")
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM8/PCM16 WAV decodes without codec libraries "
            f"(fmt={audio_fmt}, bits={bits}); bind ffmpeg for the rest")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    n_frames = len(samples) // n_ch
    return rate, n_ch, samples[: n_frames * n_ch].reshape(n_frames, n_ch)


AUDIO_FEATURES_SCHEMA = ("id string, sample_rate int, channels int, "
                         "n_frames bigint, duration_sec double, "
                         "rms double, peak double, err string")


def audio_features(df, audio_col: str = "audio", id_col: str = "id"):
    """(id, audio binary) -> typed audio features (rate, channels, frames,
    duration, RMS, peak) via an Arrow-batched mapInPandas kernel; rows
    that fail to parse report err — never task failures."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["audio"]):
                if raw is None:
                    rows.append((rid, 0, 0, 0, 0.0, 0.0, 0.0, "null_payload"))
                    continue
                try:
                    rate, n_ch, samples = decode_wav(bytes(raw))
                except (NotImplementedError, ValueError) as e:
                    rows.append((rid, 0, 0, 0, 0.0, 0.0, 0.0, type(e).__name__))
                    continue
                n = samples.shape[0]
                mono = samples.mean(axis=1) if n else np.zeros(0)
                rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
                peak = float(np.abs(samples).max()) if n else 0.0
                rows.append((rid, rate, n_ch, n,
                             n / rate if rate else 0.0, rms, peak, None))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "id", "sample_rate", "channels", "n_frames",
                    "duration_sec", "rms", "peak", "err"])

    return df.select(df[id_col].cast("string").alias("id"),
                     df[audio_col].alias("audio")) \
             .mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_SPECTRUM_SCHEMA = ("id string, sample_rate int, n_frames bigint, "
                         "dominant_bin int, dominant_hz double, err string")


def audio_spectrum(df, audio_col: str = "audio", id_col: str = "id"):
    """(id, audio binary) -> dominant spectral bin of the mono mix via a
    numpy rFFT inside the Arrow kernel — the signal-level dedup /
    fingerprint primitive (tone detection, silence/sweep screening).
    ``dominant_hz = bin * rate / n_frames`` is one exact IEEE division,
    so pure-tone fixtures get a closed-form oracle; parse failures
    report err, never task failures."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["audio"]):
                if raw is None:
                    rows.append((rid, 0, 0, -1, 0.0, "null_payload"))
                    continue
                try:
                    rate, _n_ch, samples = decode_wav(bytes(raw))
                except (NotImplementedError, ValueError) as e:
                    rows.append((rid, 0, 0, -1, 0.0, type(e).__name__))
                    continue
                n = samples.shape[0]
                if n == 0:
                    rows.append((rid, rate, 0, -1, 0.0, "empty_audio"))
                    continue
                mono = samples.mean(axis=1)
                spec = np.abs(np.fft.rfft(mono))
                k = int(spec.argmax())
                rows.append((rid, rate, n, k, k * rate / n, None))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "id", "sample_rate", "n_frames", "dominant_bin",
                    "dominant_hz", "err"])

    return df.select(df[id_col].cast("string").alias("id"),
                     df[audio_col].alias("audio")) \
             .mapInPandas(kernel, schema=AUDIO_SPECTRUM_SCHEMA)


SVID_MAGIC = b"SVID"


def sample_frames(payload: bytes, every_n: int = 30) -> list:
    """Video frame sampling: every ``every_n``-th frame as
    ``(frame_idx, HxW uint8 gray array)``.

    Real containers (MP4/WebM/...) need an ffmpeg binding — that seam
    raises NotImplementedError.  The deterministic SVID fixture
    container (``SVID | ver:u8 | w:u16 | h:u16 | n_frames:u16 |
    frames``, raw gray bytes — the video analog of the SPDF payload)
    decodes for real so the Spark-side plumbing is testable
    end-to-end."""
    import struct

    import numpy as np
    if payload[:4] != SVID_MAGIC:
        raise NotImplementedError(
            "video codecs are not available in this environment; bind "
            "ffmpeg here in production (the SVID fixture container "
            "decodes natively)")
    if len(payload) < 11:
        raise ValueError("truncated SVID header")
    ver = payload[4]
    if ver != 1:
        raise ValueError(f"unsupported SVID version {ver}")
    w, h, n_frames = struct.unpack_from("<HHH", payload, 5)
    fsize = w * h
    if len(payload) < 11 + n_frames * fsize:
        raise ValueError("truncated SVID frame data")
    out = []
    for idx in range(0, n_frames, max(1, int(every_n))):
        off = 11 + idx * fsize
        frame = np.frombuffer(payload, np.uint8, fsize, off).reshape(h, w)
        out.append((idx, frame))
    return out


VIDEO_FRAMES_SCHEMA = ("id string, frame_idx int, width int, height int, "
                       "mean_lum double, err string")


def video_frame_features(df, every_n: int = 30, video_col: str = "video",
                         id_col: str = "id"):
    """(id, video binary) -> one row per SAMPLED frame with typed
    features — the frame-sampling stage of a multimodal training
    pipeline, as an Arrow-batched flatMap (``mapInPandas``): each
    payload fans out to ceil(n_frames / every_n) rows.  Undecodable /
    real-codec payloads emit a single err row — the quarantine
    contract, never a task failure."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["video"]):
                if raw is None:
                    rows.append((rid, -1, 0, 0, 0.0, "null_payload"))
                    continue
                try:
                    frames = sample_frames(bytes(raw), every_n)
                except (NotImplementedError, ValueError) as e:
                    rows.append((rid, -1, 0, 0, 0.0, type(e).__name__))
                    continue
                for idx, frame in frames:
                    rows.append((rid, idx, frame.shape[1], frame.shape[0],
                                 float(frame.astype(np.float64).mean()),
                                 None))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "id", "frame_idx", "width", "height", "mean_lum",
                    "err"])

    return df.select(df[id_col].cast("string").alias("id"),
                     df[video_col].alias("video")) \
             .mapInPandas(kernel, schema=VIDEO_FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash) + Hamming-banded near-dup pairs
# ---------------------------------------------------------------------------

DHASH_SIZE = 8


def dhash_from_array(arr, hash_size: int = DHASH_SIZE) -> int:
    """64-bit difference hash (dHash — the standard perceptual image
    fingerprint: Krawetz 2013) of a decoded raster, ALL-INTEGER so the
    value is bit-identical cross-run and SQL-pinnable: integer ITU-601
    luma ``(299R+587G+114B)//1000``, integral-image block means with
    floor division over a ``(hash_size+1)×hash_size`` grid (floor cell
    boundaries ``i·w//(hash_size+1)``), strict ``>`` on horizontally
    adjacent cell means, bits packed row-major, returned as signed
    int64 (two's complement).  Single spelling shared by the Spark
    kernel and the oracle replay."""
    import numpy as np

    if arr.ndim == 3 and arr.shape[2] >= 3:
        a = arr.astype(np.int64)
        g = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    elif arr.ndim == 3:                                  # gray+alpha
        g = arr[..., 0].astype(np.int64)
    else:
        g = arr.astype(np.int64)
    h, w = g.shape
    if h < hash_size or w < hash_size + 1:
        raise ValueError(
            f"raster {w}x{h} smaller than the {hash_size + 1}x{hash_size} "
            f"dhash grid")
    s = np.zeros((h + 1, w + 1), dtype=np.int64)
    s[1:, 1:] = g.cumsum(0).cumsum(1)
    xs = [i * w // (hash_size + 1) for i in range(hash_size + 2)]
    ys = [j * h // hash_size for j in range(hash_size + 1)]
    bits = 0
    for r in range(hash_size):
        y0, y1 = ys[r], ys[r + 1]
        means = []
        for c in range(hash_size + 1):
            x0, x1 = xs[c], xs[c + 1]
            cell = s[y1, x1] - s[y0, x1] - s[y1, x0] + s[y0, x0]
            means.append(int(cell) // ((y1 - y0) * (x1 - x0)))
        for c in range(hash_size):
            bits = (bits << 1) | (1 if means[c] > means[c + 1] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64                                  # signed int64
    return bits


IMAGE_DHASH_SCHEMA = "id string, dhash bigint, err string"


def image_dhash(df, image_col: str = "image", id_col: str = "id"):
    """(id, image binary) → (id, dhash, err): perceptual 64-bit dHash
    via the same dependency-free decoders as ``image_features``.
    Undecodable or sub-grid payloads report ``err`` instead of failing
    the task (the quarantine contract).  Arrow kernel, map-only — the
    hash rides the scan; downstream dedup shuffles 8-byte hashes, never
    pixels, which is what makes image-level dedup tractable at 10^12
    documents."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["image"]):
                if raw is None:
                    rows.append((rid, None, "null_payload"))
                    continue
                try:
                    rows.append(
                        (rid, dhash_from_array(decode_image(bytes(raw))),
                         None))
                except (NotImplementedError, ValueError) as e:
                    rows.append((rid, None, type(e).__name__))
            if rows:
                # nullable Int64, NOT the float64 a mixed None+int column
                # infers — 64-bit hashes do not round-trip through double
                yield pd.DataFrame({
                    "id": [r[0] for r in rows],
                    "dhash": pd.array([r[1] for r in rows], dtype="Int64"),
                    "err": [r[2] for r in rows]})

    return df.select(df[id_col].cast("string").alias("id"),
                     df[image_col].alias("image")) \
             .mapInPandas(kernel, schema=IMAGE_DHASH_SCHEMA)


def image_near_dup_pairs(hashes, id_col: str = "id",
                         hash_col: str = "dhash", max_hamming: int = 3,
                         n_bands: int = 4):
    """Near-duplicate image pairs within ``max_hamming`` bits of dHash
    — the pigeonhole band-LSH shape of dedup.simhash_near_pairs applied
    to the perceptual hash: any pair ≤ max_hamming < n_bands bits apart
    agrees on at least one whole 16-bit band, so candidates = pairs
    sharing a band value (a tiny (band, value, id) shuffle; pixels
    never move), verified with an exact JVM-side popcount.  Returns
    (id_a, id_b, hamming)."""
    from pyspark.sql import functions as F

    assert max_hamming < n_bands, "pigeonhole requires max_hamming < n_bands"
    width = 64 // n_bands
    mask = (1 << width) - 1
    src = hashes.where(F.col(hash_col).isNotNull())
    bands = [
        F.shiftright(F.col(hash_col), i * width)
         .bitwiseAND(F.lit(mask)).alias("bv")
        for i in range(n_bands)
    ]
    sig = src.select(
        F.col(id_col), F.col(hash_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"), b) for i, b in enumerate(bands)
        ])).alias("bb"),
    ).select(id_col, hash_col, "bb.band", "bb.bv")
    a, b = sig.alias("a"), sig.alias("b")
    cand = (a.join(b, ["band", "bv"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col(f"a.{hash_col}").alias("h_a"),
                    F.col(f"b.{hash_col}").alias("h_b"))
            .distinct())
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")) \
               .where(F.col("hamming") <= max_hamming)


VIDEO_DHASH_SCHEMA = "id string, frame_idx int, dhash bigint, err string"


def video_dhash(df, every_n: int = 1, video_col: str = "video",
                id_col: str = "id"):
    """(id, video binary) → (id, frame_idx, dhash, err): per-sampled-
    frame perceptual dHash via ``sample_frames`` (SVID container; real
    codecs behind the documented ffmpeg seam → err rows) and the same
    all-integer ``dhash_from_array`` the image path uses.  Arrow
    kernel, map-only; downstream video dedup joins 8-byte frame hashes
    — pixels never ride a shuffle."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["video"]):
                if raw is None:
                    rows.append((rid, -1, None, "null_payload"))
                    continue
                try:
                    frames = sample_frames(bytes(raw), every_n)
                    for idx, frame in frames:
                        rows.append(
                            (rid, idx, dhash_from_array(frame), None))
                except (NotImplementedError, ValueError) as e:
                    rows.append((rid, -1, None, type(e).__name__))
            if rows:
                yield pd.DataFrame({
                    "id": [r[0] for r in rows],
                    "frame_idx": np.array([r[1] for r in rows],
                                          dtype=np.int32),
                    "dhash": pd.array([r[2] for r in rows], dtype="Int64"),
                    "err": [r[3] for r in rows]})

    return df.select(df[id_col].cast("string").alias("id"),
                     df[video_col].alias("video")) \
             .mapInPandas(kernel, schema=VIDEO_DHASH_SCHEMA)


def video_near_dup_pairs(frame_hashes, min_shared: int = 2,
                         max_hash_freq: int | None = None,
                         id_col: str = "id", hash_col: str = "dhash"):
    """Near-duplicate video pairs: videos sharing at least
    ``min_shared`` DISTINCT frame dHashes (the keyframe-fingerprint
    shape of content-ID systems).  Candidates come from an exact
    self-join on the 8-byte hash, so only (hash, id) pairs shuffle.

    ``max_hash_freq`` is the boilerplate-frame guard: a hash carried
    by more than that many videos (black/white/intro cards — the
    video analog of stop-grams) is dropped from candidate generation,
    bounding the worst hash bucket's join fan-out at
    ``max_hash_freq²``; the frequency count is a window over the same
    hash partitioning the self-join uses, so Catalyst reuses one
    exchange.  Returns (id_a, id_b, n_shared)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = (frame_hashes.where(F.col(hash_col).isNotNull())
         .select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
         .distinct())
    if max_hash_freq is not None:
        d = d.withColumn(
            "__nv", F.count("*").over(Window.partitionBy("h"))) \
             .where(F.col("__nv") <= max_hash_freq).drop("__nv")
    a, b = d.alias("a"), d.alias("b")
    return (a.join(b, "h")
            .where(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
            .agg(F.count("*").cast("bigint").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))
