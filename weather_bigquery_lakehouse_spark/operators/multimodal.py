"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB of images/audio/video:
  * the payload is a `binary` column next to a metadata struct — Spark
    shuffles/spills binary columns fine, and parquet stores them chunked;
  * decode / feature-extract / resize / frame-sample run as Arrow-batched
    `mapInPandas` stages (one Python worker per partition, zero-copy
    batches) — NEVER row-at-a-time UDFs;
  * real codecs (PIL/ffmpeg/torchaudio) are not in this container, so the
    decode body is STUBBED: `decode_image_stub` raises NotImplementedError
    unless `fake=True`, which substitutes a deterministic header parse so
    the Spark-side plumbing (schema, batching, partitioning) is testable.

The Spark-side shape — schema in/out, `mapInPandas` signature, batch
iteration — is the real, production-shaped part.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str, id_col: str | None = None
) -> DataFrame:
    """Wrap an existing binary column into the engine's media layout
    (payload + typed metadata struct). ``id_col`` names the caller's
    stable id and is REQUIRED (raises if omitted): the engine's contract
    is output as a pure function of the data, and the tempting
    `monotonically_increasing_id` fallback is partition-order-dependent
    — the id would change under repartitioning (tools/plan_lint.py bans
    it from registry plans for the same reason)."""
    if not id_col:
        raise ValueError(
            "attach_media needs an explicit id_col naming a stable media "
            "id — a partition-order-dependent synthetic id would not be "
            "reproducible across layouts"
        )
    media_id = F.col(id_col).cast("long")
    return df.select(
        media_id.alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL image-dimension decode from container headers — pure byte
    arithmetic, zero codec dependencies, which is exactly what a 100 TB
    metadata-extraction pass wants: (format, width, height) without
    rasterizing a single pixel. Returns ``None`` for unrecognized bytes.

    Formats (all from their public file-format specs):
      * PNG  — 8-byte signature, then the IHDR chunk: width/height are
        big-endian u32 at offsets 16/20.
      * GIF  — 'GIF87a'/'GIF89a', logical screen width/height are
        little-endian u16 at offsets 6/8.
      * BMP  — 'BM', BITMAPINFOHEADER width/height are little-endian i32
        at offsets 18/22 (height negative for top-down rows — abs()).
      * PPM  — binary 'P6': ASCII width/height tokens after the magic,
        '#' comments allowed.
      * JPEG — walk the 0xFF-marker segments to the first SOF frame
        header (C0–C3, C5–C7, C9–CB, CD–CF): height/width are big-endian
        u16 at payload offsets 3/5 inside the segment.
    """
    import re
    import struct

    p = payload
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return "png", w, h
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return "gif", w, h
    if len(p) >= 26 and p[:2] == b"BM":
        w, h = struct.unpack("<ii", p[18:26])
        return "bmp", abs(w), abs(h)
    if len(p) >= 2 and p[:2] == b"P6":
        m = re.match(
            rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s", p
        )
        if m:
            return "ppm", int(m.group(1)), int(m.group(2))
        return None
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        i = 2
        sof = frozenset(
            range(0xC0, 0xD0)
        ) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC
        while i + 4 <= len(p):
            if p[i] != 0xFF:  # desynced — not a well-formed marker stream
                return None
            # Any number of 0xFF fill bytes may pad before a marker
            # (ITU T.81 §B.1.1.2) — skip them so padding is not read as
            # a standalone marker followed by a bogus segment length.
            while i + 4 <= len(p) and p[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(p):
                return None
            marker = p[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", p[i + 2 : i + 4])
            if marker in sof:
                if i + 9 > len(p):
                    return None
                h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return None
    return None


def decode_image_stub(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Image decode. ``fake=False`` runs the REAL header decoder
    (:func:`parse_image_header` — PNG/GIF/BMP/PPM/JPEG dimensions from
    pure byte arithmetic, no codec library) and raises only for formats
    whose dimensions genuinely need a codec (e.g. WebP VP8 bitstream
    parsing, HEIC boxes). ``fake=True`` keeps the deterministic test
    double unchanged (the gate fixture's text payloads are not images,
    and the oracle mirrors exactly this arithmetic)."""
    if not fake:
        parsed = parse_image_header(payload)
        if parsed is None:
            raise NotImplementedError(
                "unrecognized image container — header-level decode covers "
                "PNG/GIF/BMP/PPM/JPEG; other formats need a codec library "
                "(run with fake=True for the deterministic test double)"
            )
        _fmt, w, h = parsed
        return w, h
    # Deterministic fake: dimensions from the first payload bytes.
    w = 64 + (payload[0] if payload else 0)
    h = 64 + (payload[1] if len(payload) > 1 else 0)
    return w, h


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode stage over the media layout → typed features.

    The checksum is computed JVM-side (`F.sha2` — vectorized, inside
    codegen) BEFORE the Python stage: only the decode itself genuinely
    needs Python, and at 100 TB of payload bytes hashing in Python would
    double the slow-path work for no reason. `mapInPandas` keeps
    partitioning intact (no shuffle) and moves data Python-side one Arrow
    batch at a time; output schema is pinned. NULL payloads null-propagate
    (checksum/width/height NULL) instead of killing the stage."""
    with_checksum = df.withColumn("checksum", F.sha2(F.col("payload"), 256))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            dims = [
                None if p is None else decode_image_stub(bytes(p), fake=fake)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": pd.array(
                        [d[0] if d else None for d in dims], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] if d else None for d in dims], dtype="Int32"
                    ),
                    "checksum": pdf["checksum"],
                }
            )

    return with_checksum.mapInPandas(_decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale_ppm", T.LongType()),
        T.StructField("is_downscaled", T.IntegerType()),
    ]
)


def resize_plan(width: int | None, height: int | None, max_side: int):
    """Aspect-preserving fit-to-box in exact integer math: the target
    dimensions every thumbnailing/resize stage computes before touching
    pixels. Returns (out_w, out_h, scale_ppm, is_downscaled); dimensions
    null-propagate. The PIXEL resample itself needs an image library —
    stubbed like the codec (the Spark-side batch plumbing is the real
    part); the dimension plan is the testable, oracle-portable half."""
    if width is None or height is None:
        return None, None, None, None
    longest = max(width, height)
    if longest <= max_side:
        return width, height, 1_000_000, 0
    return (
        (width * max_side) // longest,
        (height * max_side) // longest,
        (max_side * 1_000_000) // longest,
        1,
    )


def resize_media(df: DataFrame, max_side: int = 96) -> DataFrame:
    """Arrow-batched resize stage over the decoded media frame (the third
    stage of the quartet: decode → feature-extract → RESIZE →
    frame-sample). Consumes (media_id, width, height), emits the exact
    integer resize plan per row; `mapInPandas` keeps partitioning intact
    and moves one Arrow batch at a time — the identical batch shape the
    pixel-buffer version uses, so swapping the stub for a real resampler
    changes only the kernel body."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            plans = [
                resize_plan(
                    None if pd.isna(w) else int(w),
                    None if pd.isna(h) else int(h),
                    max_side,
                )
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": pd.array([p[0] for p in plans], dtype="Int32"),
                    "out_height": pd.array([p[1] for p in plans], dtype="Int32"),
                    "scale_ppm": pd.array([p[2] for p in plans], dtype="Int64"),
                    "is_downscaled": pd.array([p[3] for p in plans], dtype="Int32"),
                }
            )

    return df.select("media_id", "width", "height").mapInPandas(
        _resize, schema=RESIZED_SCHEMA
    )


def decode_ppm_pixels(payload: bytes):
    """REAL pixel decode for binary PPM (P6) — the one mainstream raster
    container whose pixels are raw bytes, so a 100 TB pipeline can decode
    it with zero codec dependencies: header via
    :func:`parse_image_header`, then the trailing ``h*w*3`` RGB bytes as
    a numpy ``(h, w, 3)`` uint8 array. Returns ``None`` for non-P6 or
    truncated payloads. Only maxval 255 (the ubiquitous 1-byte-per-sample
    case) is accepted — 2-byte samples would silently mis-shape."""
    import re

    import numpy as np

    parsed = parse_image_header(payload)
    if parsed is None or parsed[0] != "ppm":
        return None
    _fmt, w, h = parsed
    m = re.match(
        rb"P6\s+(?:#[^\n]*\n\s*)*\d+\s+(?:#[^\n]*\n\s*)*\d+\s+(\d+)\s", payload
    )
    if m is None or int(m.group(1)) != 255:
        return None
    data = payload[m.end() : m.end() + h * w * 3]
    if len(data) != h * w * 3:
        return None
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def _validate_row_filters(row_filters) -> None:
    """One source of truth for the row-filter contract, checked EAGERLY
    over the whole list (not just cycle positions a given image height
    happens to reach) and shared by the driver-side synth guard and the
    encoder — so both surfaces agree on validity and fail before any
    filtering or cluster work. len()-based (not truthiness) so numpy
    arrays validate instead of raising the ambiguous-truth error;
    identity-typed so bools don't slip through as 0/1."""
    import numpy as np

    ok = len(row_filters) > 0 and all(
        isinstance(f, (int, np.integer))
        and not isinstance(f, bool)
        and 0 <= int(f) <= 4
        for f in row_filters
    )
    if not ok:
        raise ValueError(
            f"row_filters must be a non-empty list of integers 0-4; "
            f"got {row_filters!r}"
        )


def _filter_scanlines(arr, row_filters) -> bytes:
    """Forward PNG scanline filtering (spec §9 — the encoder half of the
    five filters :func:`decode_png_pixels` un-filters): per row, apply
    ``row_filters[y % len(row_filters)]`` and prepend the filter byte.
    Predictors read the ORIGINAL previous row, which (losslessly) equals
    the decoder's reconstructed row — vectorized per row in numpy."""
    import numpy as np

    _validate_row_filters(row_filters)

    h, w, c = arr.shape
    stride, bpp = w * c, c
    px = arr.astype(np.int32).reshape(h, stride)
    zeros = np.zeros(bpp, dtype=np.int32)
    out = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = px[y]
        f = int(row_filters[y % len(row_filters)])
        left = np.concatenate([zeros, line[:-bpp]])
        upleft = np.concatenate([zeros, prev[:-bpp]])
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            filt = line - left
        elif f == 2:  # Up
            filt = line - prev
        elif f == 3:  # Average
            filt = line - (left + prev) // 2
        elif f == 4:  # Paeth
            pp = left + prev - upleft
            pa, pb, pc = np.abs(pp - left), np.abs(pp - prev), np.abs(pp - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = line - pred
        else:  # unreachable: _validate_row_filters checked the list
            raise AssertionError(f)
        out.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        prev = line
    return b"".join(out)


def encode_png(arr, row_filters=None) -> bytes:
    """REAL, standard-conformant PNG encode for 8-bit RGB/RGBA arrays —
    stdlib ``zlib`` only (DEFLATE + CRC32 are the whole codec): filter-0
    scanlines by default, one IDAT, correct chunk CRCs. Any conformant
    reader decodes it; :func:`decode_png_pixels` round-trips it
    bit-exactly. Pass ``row_filters`` (a cycled list of 0-4) to choose
    per-row scanline filters — the lever that drives every un-filter
    path of the decoder from a single encoded image."""
    import struct
    import zlib

    h, w, c = arr.shape
    color_type = 2 if c == 3 else 6

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    if row_filters is None:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    else:
        raw = _filter_scanlines(arr, row_filters)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decode — stdlib ``zlib`` plus the five scanline
    un-filters from the public spec (None/Sub/Up/Average/Paeth), no
    image library: returns an ``(h, w, 3|4)`` uint8 array for 8-bit
    truecolor (RGB/RGBA, non-interlaced) PNGs, ``None`` for anything
    else (palette/16-bit/interlaced genuinely warrant a full library).
    Sub un-filters vectorize as a per-pixel-column cumulative sum mod
    256; Up is a row add; Average/Paeth are left-recon-dependent and run
    per pixel within the row (correctness first — the hot path at scale
    is the Arrow batch boundary, not the scanline loop)."""
    import struct
    import zlib

    import numpy as np

    p = payload
    if len(p) < 8 or p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, ihdr, idat = 8, None, b""
    while i + 8 <= len(p):
        (clen,) = struct.unpack(">I", p[i : i + 4])
        typ = p[i + 4 : i + 8]
        data = p[i + 8 : i + 8 + clen]
        if len(data) != clen:
            return None
        if typ == b"IHDR":
            if len(data) < 13:  # malformed: quarantine, never raise
                return None
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or interlace != 0:
        return None
    bpp = 3 if color_type == 2 else 4
    stride = w * bpp
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if len(raw) != h * (1 + stride):
        return None
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = y * (1 + stride)
        f = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, offset=base + 1).astype(
            np.int32
        )
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumulative sum down each pixel column offset
            rec = (np.cumsum(line.reshape(w, bpp), axis=0) % 256).ravel()
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average: floor((left + up) / 2), left is RECON
            # left-recon dependency runs along x only — loop per PIXEL,
            # all bpp channels vectorized (the per-column formulation
            # Sub admits; w iterations instead of w·bpp)
            rec = np.empty(stride, dtype=np.int32)
            lm, pm, rm = (v.reshape(w, bpp) for v in (line, prev, rec))
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                left = (lm[x] + (left + pm[x]) // 2) % 256
                rm[x] = left
        elif f == 4:  # Paeth — same per-pixel loop, channel-vectorized
            rec = np.empty(stride, dtype=np.int32)
            lm, pm, rm = (v.reshape(w, bpp) for v in (line, prev, rec))
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                b = pm[x]
                pp = left + b - upleft
                pa = np.abs(pp - left)
                pb = np.abs(pp - b)
                pc = np.abs(pp - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, upleft)
                )
                left = (lm[x] + pred) % 256
                rm[x] = left
                upleft = b
        else:
            return None
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, bpp)


def decode_pixels(payload: bytes):
    """Pixel decode dispatch across the REAL zero-dependency codecs:
    returns ``(array, format)`` for P6 PPM, 8-bit truecolor PNG, and
    baseline/extended-sequential JPEG (``operators/jpeg.py`` — r11's
    stub→real conversion, the same path the r10 PNG codec took),
    ``None`` otherwise (WebP/HEIC rasterization and progressive JPEG
    genuinely need a codec library)."""
    arr = decode_ppm_pixels(payload)
    if arr is not None:
        return arr, "ppm"
    arr = decode_png_pixels(payload)
    if arr is not None:
        return arr, "png"
    if len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_pixels

        arr = decode_jpeg_pixels(payload)
        if arr is not None:
            return arr, "jpeg"
    return None


def resample_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resample of an ``(h, w, c)`` array by exact
    integer index maps (``(i * in) // out`` — deterministic, no float
    rounding, the resize twin of the engine's div discipline)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes — the inverse of
    :func:`decode_ppm_pixels`, so resized payloads stay re-decodable."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _synth_pixels_media(
    df: DataFrame,
    pack,
    key_col: str,
    row_col: str,
    col_col: str,
    ch_col: str,
    value_col: str,
) -> DataFrame:
    """Shared grouped-synth plumbing for the pixel packers: each key's
    dense (r, c, ch, value) rows sort, reshape to ``(h, w, 3)`` (dims
    inferred as max index + 1 — the caller supplies a DENSE grid), and
    pack via the ``pack(array) -> bytes`` callback."""
    import numpy as np

    def _synth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([row_col, col_col, ch_col])
        h = int(pdf[row_col].max()) + 1
        w = int(pdf[col_col].max()) + 1
        arr = pdf[value_col].to_numpy().astype(np.uint8).reshape(h, w, 3)
        return pd.DataFrame(
            {
                "media_id": [int(pdf[key_col].iloc[0])],
                "payload": [pack(arr)],
            }
        )

    return df.groupBy(key_col).applyInPandas(
        _synth, schema="media_id long, payload binary"
    )


def synth_ppm_media(
    df: DataFrame,
    key_col: str = "media_id",
    row_col: str = "r",
    col_col: str = "c",
    ch_col: str = "ch",
    value_col: str = "v",
) -> DataFrame:
    """One P6 payload per key from dense (key, r, c, ch, value) pixel
    rows — :func:`synth_wav_media`'s image twin, packing via
    :func:`encode_ppm`. Exists so the P6 encode → decode → resample
    round-trip can be driven under the DuckDB hash gate from
    declaratively generated pixels."""
    return _synth_pixels_media(
        df, encode_ppm, key_col, row_col, col_col, ch_col, value_col
    )


def synth_png_media(
    df: DataFrame,
    key_col: str = "media_id",
    row_col: str = "r",
    col_col: str = "c",
    ch_col: str = "ch",
    value_col: str = "v",
    row_filters: list[int] | None = None,
) -> DataFrame:
    """:func:`synth_ppm_media`'s PNG twin: one REAL 8-bit truecolor PNG
    payload per key, packed via :func:`encode_png`. ``row_filters``
    selects per-row scanline filters (cycled), so a single synthesized
    image can exercise every un-filter path of :func:`decode_png_pixels`
    — the lever the PNG round-trip oracle entry uses to pin all five
    filters under the hash gate."""
    if row_filters is not None:
        # validate DRIVER-side, before any cluster work — worker-side the
        # same error surfaces as a task-failure-wrapped PythonException
        _validate_row_filters(row_filters)
    return _synth_pixels_media(
        df,
        lambda arr: encode_png(arr, row_filters=row_filters),
        key_col,
        row_col,
        col_col,
        ch_col,
        value_col,
    )


def synth_jpeg_media(
    df: DataFrame,
    key_col: str = "media_id",
    row_col: str = "r",
    col_col: str = "c",
    ch_col: str = "ch",
    value_col: str = "v",
    subsampling: str = "4:2:0",
    quant: int = 8,
) -> DataFrame:
    """:func:`synth_ppm_media`'s JPEG twin: one REAL baseline JPEG
    payload per key via :func:`~.jpeg.encode_jpeg`. The defaults are the
    hash-gate configuration: DC quantizer 8 (any block-constant input
    round-trips bit-exactly — see ``operators/jpeg.py``) and 4:2:0
    subsampling, so the gated round-trip drives the full pipeline
    including chroma downsample, MCU interleave, and replication
    upsample. Callers supply a gray-valued 8×8-block-constant grid for
    exactness; anything else still encodes, just lossily."""
    from .jpeg import encode_jpeg

    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        # driver-side, before any cluster work (same pattern as the PNG
        # row_filters validation)
        raise ValueError("subsampling must be '4:4:4', '4:2:2', or '4:2:0'")
    return _synth_pixels_media(
        df,
        lambda arr: encode_jpeg(arr, quant_luma=quant, subsampling=subsampling),
        key_col,
        row_col,
        col_col,
        ch_col,
        value_col,
    )


def pixels_rows(df: DataFrame, payload_col: str = "out_payload") -> DataFrame:
    """The inverse of :func:`synth_ppm_media`/:func:`synth_png_media`:
    decode each payload (format-dispatched via :func:`decode_pixels` —
    P6 PPM, 8-bit truecolor PNG, or baseline sequential JPEG) and emit
    one (media_id, r, c, ch, v)
    row per sample — the row-multiplying Arrow stage that brings pixels
    back into DataFrame land, so pixel assertions/aggregations run as
    plain JVM-side SQL (and the oracle can mirror them without ever
    seeing a byte). Undecodable payloads emit no rows (quarantine)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("r", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("ch", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            frames = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                decoded = (
                    decode_pixels(bytes(payload)) if payload is not None else None
                )
                if decoded is None:
                    continue
                arr = decoded[0][:, :, :3]  # checksum over RGB planes
                h, w, _ = arr.shape
                import numpy as np

                rr, cc, chh = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": media_id,
                            "r": rr.ravel().astype("int32"),
                            "c": cc.ravel().astype("int32"),
                            "ch": chh.ravel().astype("int32"),
                            "v": arr.ravel().astype("int32"),
                        }
                    )
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {"media_id": pd.array([], dtype="int64"),
                     "r": pd.array([], dtype="int32"),
                     "c": pd.array([], dtype="int32"),
                     "ch": pd.array([], dtype="int32"),
                     "v": pd.array([], dtype="int32")}
                )
            )

    return df.select("media_id", payload_col).mapInPandas(
        _rows, schema=out_schema
    )


#: Back-compat name from when the stage decoded P6 only — same function.
ppm_pixels_rows = pixels_rows


def pixels_rows_sides(df: DataFrame, sides: dict[str, str]) -> DataFrame:
    """:func:`pixels_rows` over SEVERAL payload columns in ONE pass: for
    each input row, decode every ``sides[label] = column`` payload and
    emit (media_id, side, r, c, ch, v) rows tagged with the label.

    Why it exists: an entry that checksums both the pre- and post-resize
    payloads would otherwise reference the synth/resize frame from two
    plan branches, and Spark re-plans non-identical union/join branches
    into TWO executions of the whole upstream kernel chain (the
    union-branch re-plan class — ADVICE r10 on image_png_resize_events).
    One tagged decode keeps the upstream single-execution; the per-side
    aggregation happens JVM-side with conditional aggregates.
    Undecodable payloads emit no rows for that side (quarantine)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("side", T.StringType()),
            T.StructField("r", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("ch", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    labels = list(sides)

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            frames = []
            for idx in range(len(pdf)):
                media_id = pdf["media_id"].iloc[idx]
                for label in labels:
                    payload = pdf[sides[label]].iloc[idx]
                    decoded = (
                        decode_pixels(bytes(payload))
                        if payload is not None
                        else None
                    )
                    if decoded is None:
                        continue
                    arr = decoded[0][:, :, :3]
                    h, w, _ = arr.shape
                    rr, cc, chh = np.meshgrid(
                        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                    )
                    frames.append(
                        pd.DataFrame(
                            {
                                "media_id": media_id,
                                "side": label,
                                "r": rr.ravel().astype("int32"),
                                "c": cc.ravel().astype("int32"),
                                "ch": chh.ravel().astype("int32"),
                                "v": arr.ravel().astype("int32"),
                            }
                        )
                    )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {"media_id": pd.array([], dtype="int64"),
                     "side": pd.array([], dtype="str"),
                     "r": pd.array([], dtype="int32"),
                     "c": pd.array([], dtype="int32"),
                     "ch": pd.array([], dtype="int32"),
                     "v": pd.array([], dtype="int32")}
                )
            )

    cols = ["media_id", *dict.fromkeys(sides.values())]
    return df.select(*cols).mapInPandas(_rows, schema=out_schema)


def resize_pixels_media(
    df: DataFrame, max_side: int = 96, keep_payload: bool = False
) -> DataFrame:
    """The resize stage with a REAL pixel kernel for P6 and 8-bit
    truecolor PNG payloads: per media row, decode raw pixels
    (:func:`decode_pixels` — the zero-dependency PPM/PNG codecs),
    compute the same exact-integer :func:`resize_plan`, nearest-neighbor
    resample in numpy, and re-encode IN THE SAME FORMAT — Arrow batches
    in, Arrow batches out, identical stage shape to :func:`resize_media`
    (which plans dimensions for payloads whose pixels need a codec
    library). Undecodable payloads emit NULL ``out_payload`` with NULL
    dims — the quarantine column pattern, never a stage kill.
    ``keep_payload=True`` carries the INPUT payload through as an extra
    ``payload`` column, so a consumer that needs both pre- and
    post-resize bytes (e.g. a before/after checksum via
    :func:`pixels_rows_sides`) reads them off ONE frame instead of
    re-referencing the upstream synth from a second plan branch."""
    fields = [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("out_payload", T.BinaryType()),
    ]
    if keep_payload:
        fields.append(T.StructField("payload", T.BinaryType()))
    out_schema = T.StructType(fields)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else None
                tail = (raw,) if keep_payload else ()
                decoded = decode_pixels(raw) if raw is not None else None
                if decoded is None:
                    rows.append((media_id, None, None, None, None, None) + tail)
                    continue
                arr, fmt = decoded
                h, w = arr.shape[0], arr.shape[1]
                ow, oh, _scale, down = resize_plan(w, h, max_side)
                out = resample_nearest(arr, ow, oh) if down else arr
                encoded = encode_png(out) if fmt == "png" else encode_ppm(out)
                rows.append((media_id, w, h, ow, oh, encoded) + tail)
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return df.select("media_id", "payload").mapInPandas(_resize, schema=out_schema)


def parse_audio_header(payload: bytes) -> tuple[str, int, int, int, int] | None:
    """REAL audio metadata decode for RIFF/WAVE — like
    :func:`parse_image_header`, pure byte arithmetic from the public
    container spec, no audio library: returns ``(format, channels,
    sample_rate, bits_per_sample, n_frames)`` or ``None`` for
    unrecognized/malformed bytes. Walks the RIFF chunk list to ``fmt ``
    (audio format 1 = PCM only — compressed codecs need a decoder) and
    sizes frames off the ``data`` chunk."""
    import struct

    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i = 12
    channels = rate = bits = data_len = None
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        (clen,) = struct.unpack("<I", p[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(p):
            fmt_code, channels, rate = struct.unpack("<HHI", p[i + 8 : i + 16])
            (bits,) = struct.unpack("<H", p[i + 22 : i + 24])
            if fmt_code != 1:  # non-PCM needs a real codec
                return None
        elif cid == b"data":
            data_len = min(clen, len(p) - i - 8)
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not channels or not rate or not bits or data_len is None:
        return None
    bytes_per_frame = channels * (bits // 8)
    if bytes_per_frame == 0:
        return None
    return "wav", channels, rate, bits, data_len // bytes_per_frame


def decode_wav_pcm(payload: bytes):
    """REAL PCM sample decode for WAV: the ``data`` chunk as a numpy
    ``(frames, channels)`` array — int16 for 16-bit, uint8 recentered to
    int16 range for 8-bit. Returns ``None`` for anything
    :func:`parse_audio_header` rejects or odd bit depths."""
    import struct

    import numpy as np

    meta = parse_audio_header(payload)
    if meta is None:
        return None
    _fmt, channels, _rate, bits, n_frames = meta
    if bits not in (8, 16) or n_frames == 0:
        return None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"data":
            raw = payload[i + 8 : i + 8 + n_frames * channels * (bits // 8)]
            if bits == 16:
                arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
            else:
                arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128) * 256
            return arr.reshape(n_frames, channels)
        i += 8 + clen + (clen & 1)
    return None


def parse_video_header(payload: bytes):
    """REAL video metadata decode — the triad-completing twin of
    :func:`parse_image_header` / :func:`parse_audio_header`, pure byte
    arithmetic from the public container specs: returns ``(format,
    duration_ms, width, height, n_frames)`` with ``None`` fields where
    the container does not carry them, or ``None`` for unrecognized
    bytes.

    * MP4/ISO-BMFF — walk the top-level box list (u32 BE size + fourcc;
      size 0 = to-EOF, size 1 = u64 largesize) to ``moov``, then its
      children to ``mvhd``: version 0 carries timescale/duration as u32
      at offsets 12/16 of the box payload, version 1 as u32/u64 at
      20/24. duration_ms = duration · 1000 div timescale (exact floor).
    * AVI — RIFF/'AVI ' with the ``avih`` main header: µs-per-frame,
      total frames, width, height at payload offsets 0/16/32/36 (LE).
      duration_ms = frames · µs_per_frame div 1000.
    """
    import struct

    p = payload
    # --- MP4 / ISO base media file format ---
    if len(p) >= 8 and p[4:8] in (b"ftyp", b"moov", b"mdat", b"free", b"wide"):
        def walk(lo: int, hi: int):
            boxes = []
            i = lo
            while i + 8 <= hi:
                (size,) = struct.unpack(">I", p[i : i + 4])
                typ = p[i + 4 : i + 8]
                body = i + 8
                if size == 1:
                    if i + 16 > hi:
                        break
                    (size,) = struct.unpack(">Q", p[i + 8 : i + 16])
                    body = i + 16
                elif size == 0:
                    size = hi - i
                if size < 8 or i + size > hi:
                    break
                boxes.append((typ, body, i + size))
                i += size
            return boxes
        for typ, body, end in walk(0, len(p)):
            if typ != b"moov":
                continue
            for t2, b2, e2 in walk(body, end):
                if t2 != b"mvhd" or e2 - b2 < 20:
                    continue
                version = p[b2]
                if version == 1:
                    if e2 - b2 < 32:
                        return None
                    (timescale,) = struct.unpack(">I", p[b2 + 20 : b2 + 24])
                    (duration,) = struct.unpack(">Q", p[b2 + 24 : b2 + 32])
                else:
                    (timescale,) = struct.unpack(">I", p[b2 + 12 : b2 + 16])
                    (duration,) = struct.unpack(">I", p[b2 + 16 : b2 + 20])
                if timescale == 0:
                    return None
                return ("mp4", duration * 1000 // timescale, None, None, None)
        return None
    # --- AVI (RIFF) ---
    if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        i = 12
        while i + 8 <= len(p):
            cid = p[i : i + 4]
            (clen,) = struct.unpack("<I", p[i + 4 : i + 8])
            if cid == b"LIST":
                i += 12  # descend into the list (skip its type fourcc)
                continue
            if cid == b"avih" and i + 8 + 40 <= len(p):
                us_per_frame, _, _, _, frames = struct.unpack(
                    "<IIIII", p[i + 8 : i + 28]
                )
                w, h = struct.unpack("<II", p[i + 40 : i + 48])
                return ("avi", frames * us_per_frame // 1000, w, h, frames)
            i += 8 + clen + (clen & 1)
        return None
    return None


def encode_mp4(
    timescale: int, duration: int, version: int = 0, largesize: bool = False
) -> bytes:
    """Minimal spec-shaped ISO-BMFF bytes carrying (timescale, duration)
    in a full-size ``mvhd`` — the re-decodable inverse of
    :func:`parse_video_header`'s MP4 walk (ISO/IEC 14496-12 §8.2.2):
    ``ftyp`` + ``moov``/``mvhd`` with the requested mvhd version (0 =
    u32 fields, 1 = u64 creation/modification/duration) and, with
    ``largesize``, a size-1 + u64-largesize ``moov`` header — the three
    box-walk paths the parser dispatches on."""
    import struct

    if version == 1:
        body = b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">I", 0x00010000)  # rate 1.0
    body += struct.pack(">H", 0x0100)  # volume 1.0
    body += b"\x00" * 10  # reserved
    body += struct.pack(
        ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )  # unity matrix
    body += b"\x00" * 24  # pre_defined
    body += struct.pack(">I", 2)  # next_track_ID
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    if largesize:
        moov = (
            struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd)) + mvhd
        )
    else:
        moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    return ftyp + moov


def encode_avi(us_per_frame: int, frames: int, width: int, height: int) -> bytes:
    """Minimal spec-shaped RIFF/AVI bytes carrying the ``avih`` main
    header — the re-decodable inverse of :func:`parse_video_header`'s
    AVI walk: ``RIFF``/``AVI `` + ``LIST hdrl`` + a full 56-byte
    ``avih`` (µs-per-frame, total frames, width, height at their spec
    offsets 0/16/32/36)."""
    import struct

    avih = (
        struct.pack("<IIIIIIII", us_per_frame, 0, 0, 0, frames, 0, 1, 0)
        + struct.pack("<II", width, height)
        + b"\x00" * 16
    )
    chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", 4 + len(chunk)) + b"hdrl" + chunk
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


#: synth_media_payloads variant codes → container built per row.
MEDIA_VARIANTS = {
    0: "wav",
    1: "ppm",
    2: "png",
    3: "mp4_v0",
    4: "avi",
    5: "garbage",
    6: "mp4_v1",
    7: "mp4_v1_largesize",
}


def synth_media_payloads(df: DataFrame) -> DataFrame:
    """One REAL container payload per input row from declarative
    parameters — the mixed-format synth behind the video-metadata and
    probe-dispatch oracle entries: columns (media_id, variant, p1, p2,
    p3, p4) map to an encoder per :data:`MEDIA_VARIANTS` (wav: p1 =
    frame count at 8 kHz; ppm/png: p1×p2 zero pixels; mp4: p1 =
    timescale, p2 = duration, mvhd version/largesize per variant; avi:
    p1 = µs-per-frame, p2 = frames, p3×p4 dims; garbage: deliberately
    unparseable bytes). Row-wise Arrow ``mapInPandas`` — payload sizes
    are header-bounded (≤ a few KB), so batches stay flat."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _build(variant: int, p1: int, p2: int, p3: int, p4: int) -> bytes:
        if variant == 0:
            return encode_wav([0] * p1, rate=8000)
        if variant in (1, 2):
            arr = np.zeros((p2, p1, 3), dtype=np.uint8)
            return encode_ppm(arr) if variant == 1 else encode_png(arr)
        if variant == 3:
            return encode_mp4(p1, p2, version=0)
        if variant == 4:
            return encode_avi(p1, p2, p3, p4)
        if variant == 6:
            return encode_mp4(p1, p2, version=1)
        if variant == 7:
            return encode_mp4(p1, p2, version=1, largesize=True)
        return b"GARBAGE payload, parse me if you can"

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        _build(int(v), int(a), int(b), int(c), int(d))
                        for v, a, b, c, d in zip(
                            pdf["variant"], pdf["p1"], pdf["p2"],
                            pdf["p3"], pdf["p4"],
                        )
                    ],
                }
            )

    return df.select("media_id", "variant", "p1", "p2", "p3", "p4").mapInPandas(
        _synth, schema=out_schema
    )


def encode_wav(samples, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE bytes from an int sequence — the
    re-decodable inverse of :func:`decode_wav_pcm` (the
    :func:`encode_ppm` pattern for audio)."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synth_wav_media(
    df: DataFrame,
    key_col: str = "media_id",
    sample_col: str = "sample",
    order_col: str = "idx",
    rate: int = 8000,
) -> DataFrame:
    """One WAV payload per key from (key, order, sample) rows — the
    grouped Arrow stage that turns tabular PCM samples into real RIFF
    bytes (``applyInPandas``: each key's samples sort by ``order_col``
    and pack via :func:`encode_wav`). Exists so the WAV
    encode → :func:`decode_wav_pcm` → :func:`audio_features_media`
    round-trip can be driven under the DuckDB hash gate with samples
    derived deterministically from table data; per-key sample counts are
    bounded by the caller (a group must fit one Arrow batch)."""

    def _synth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        return pd.DataFrame(
            {
                "media_id": [int(pdf[key_col].iloc[0])],
                "payload": [encode_wav(list(pdf[sample_col]), rate=rate)],
            }
        )

    return df.groupBy(key_col).applyInPandas(
        _synth, schema="media_id long, payload binary"
    )


def audio_features_media(df: DataFrame, window_frames: int = 1024) -> DataFrame:
    """Windowed audio feature extraction with a REAL kernel for PCM WAV
    payloads: one row per (media, window) carrying exact-integer peak and
    sum-of-squares plus float RMS — the loudness/clipping screen an audio
    training-data pipeline runs before transcription. Arrow `mapInPandas`,
    row-multiplying like :func:`frame_sample`; non-WAV/compressed payloads
    quarantine to zero rows for that media (a NULL-window row would poison
    window aggregates downstream)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("sum_sq", T.LongType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm = (
                    decode_wav_pcm(bytes(payload)) if payload is not None else None
                )
                if pcm is None:
                    continue
                for w in range(0, pcm.shape[0], window_frames):
                    win = pcm[w : w + window_frames]
                    n = int(win.shape[0])
                    peak = int(abs(win).max())
                    ssq = int((win.astype("int64") ** 2).sum())
                    rows.append(
                        (
                            media_id,
                            w // window_frames,
                            n,
                            peak,
                            ssq,
                            math.sqrt(ssq / (n * win.shape[1])),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "window_idx", "n_frames", "peak", "sum_sq", "rms",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        _features, schema=out_schema
    )


def probe_media(df: DataFrame) -> DataFrame:
    """Content sniffing over unknown binary payloads — the first pass a
    mixed-media corpus ingest runs: dispatch each payload across the
    three REAL header decoders (:func:`parse_image_header`,
    :func:`parse_audio_header`, :func:`parse_video_header`) and emit one
    typed metadata row per media: (media_id, kind, format, width,
    height, duration_ms, n_frames) with NULLs where the container does
    not carry a field and kind='unknown' for unrecognized bytes (the
    quarantine signal — never a stage kill). Pure byte arithmetic; the
    declared mime in the media struct is untrusted input and is
    deliberately ignored."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("n_frames", T.LongType()),
        ]
    )

    def _probe_one(payload):
        if payload is None:
            return ("unknown", None, None, None, None, None)
        p = bytes(payload)
        img = parse_image_header(p)
        if img is not None:
            fmt, w, h = img
            return ("image", fmt, w, h, None, None)
        aud = parse_audio_header(p)
        if aud is not None:
            fmt, _ch, rate, _bits, frames = aud
            return ("audio", fmt, None, None, frames * 1000 // rate, frames)
        vid = parse_video_header(p)
        if vid is not None:
            fmt, dur, w, h, frames = vid
            return ("video", fmt, w, h, dur, frames)
        return ("unknown", None, None, None, None, None)

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            rows = [
                (mid, *_probe_one(p))
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "format",
                    "width", "height", "duration_ms", "n_frames",
                ],
            ).astype(
                {
                    "width": "Int32", "height": "Int32",
                    "duration_ms": "Int64", "n_frames": "Int64",
                }
            )

    return df.select("media_id", "payload").mapInPandas(_probe, schema=out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling shape for video payloads: emits one row per sampled
    "frame" offset (deterministic stride over the payload — stands in for
    keyframe extraction, which needs ffmpeg). Demonstrates the
    row-multiplying `mapInPandas` stage with bounded output batches."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_bigquery_lakehouse_spark.worker import (
            silence_arrow_concat_futurewarning,
        )

        silence_arrow_concat_futurewarning()
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows.append((media_id, i, off))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "offset"])

    return df.mapInPandas(_sample, schema=out_schema)
