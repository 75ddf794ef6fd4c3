"""Multimodal column support: opaque binary payloads + typed metadata.

Design (SURVEY §2 D4): media travels as `binary` columns beside relational
data — Spark's columnar Parquet + Arrow paths handle binary natively, so
images/audio/video are first-class without engine changes. Decoding and
feature extraction run as Arrow-batched `mapInPandas` operators: one
Python worker per partition, whole byte-batches per Arrow transfer.

Codec tiers, honestly separated:

- **REAL decoders for the formats the container can decode** with the
  stdlib + numpy alone: WAV (PCM 8/16/32-bit via ``wave`` —
  ``wav_features``), binary PPM (P6 — ``decode_rgb``), uncompressed
  24-bit BMP (``decode_rgb``), PNG — the dominant lossless web
  format — via stdlib ``zlib`` inflate + numpy per-row unfiltering
  (None/Sub/Up/Average/Paeth), covering truecolor/RGBA, paletted
  (PLTE, depths 1/2/4/8 — r11), grayscale(+alpha), 16-bit color
  types and Adam7 interlacing (r11 — the format is now COMPLETE:
  every legal color type × depth × interlace mode decodes; only
  spec-illegal or torn payloads skip), with ``encode_png`` as the export
  twin, and JPEG — the dominant LOSSY web format — via
  functions/jpeg.py: baseline sequential (r9) AND progressive/SOF2
  (r11 — the successive-approximation scan protocol; the encoder twin
  serializes the same coefficients both ways, so the test oracle is
  byte-exact), canonical Huffman entropy decode with restart markers,
  dequantization, batched float IDCT, 4:2:0/4:2:2 chroma upsampling,
  YCbCr→RGB, ``encode_jpeg`` as the test/export twin;
  ``image_stats`` and ``resize_rgb`` run on
  genuinely decoded pixel arrays (pinned against hand-constructed
  files in tests/test_multimodal_dedup.py; JPEG within the classical
  DCT round-trip tolerance at quality 100).
- **Documented remaining boundaries**: lossy-WebP VP8 and full MP4/H.264
  video (`decode_rgb` / `functions/video.py` raise ValueError there and
  callers follow the skip-row contract; AVI-MJPEG video IS decoded).
  Plumbing-only pipelines are additionally exercised end-to-end with
  `fake_image_features` — a deterministic byte-histogram extractor with
  the exact same schema, batching, and partitioning as the real path.

Scale posture: per-row Python cost is amortized by Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch); there is no shuffle — the
operator is map-only and scales linearly with executors. Binary columns
should be stored in their own Parquet column chunk (automatic) so
relational scans never read the bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = "doc_id long, n_bytes long, features array<double>"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + typed metadata struct, simulating
    a multimodal table (media bytes + envelope)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.length(F.col("payload")).alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes):
    """Alias for :func:`decode_rgb` — the package's REAL image decoder
    (PPM/BMP/PNG/GIF/VP8L-WebP/TIFF/ICO/JPEG, all pure stdlib+numpy; see
    its docstring for the exact format matrix). The one remaining image
    boundary is lossy WebP (VP8): ``decode_rgb`` raises ValueError there
    and callers follow the skip-row contract."""
    return decode_rgb(payload)


def decode_wav(payload: bytes) -> tuple[int, int, "object"]:
    """REAL WAV decode via the stdlib ``wave`` module: returns
    (sample_rate, n_channels, samples) where samples is a float64 numpy
    array in [-1, 1], channel-interleaved frames averaged to mono.
    Supports the PCM widths ``wave`` does (8-bit unsigned, 16/32-bit
    signed little-endian). Raises ``wave.Error`` on a non-WAV payload —
    callers sniff the RIFF magic first."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # 8-bit WAV is unsigned, midpoint 128
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, nch, x


def decode_aiff(payload: bytes) -> tuple[int, int, "object"]:
    """REAL AIFF/AIFF-C PCM decode (r12 — making the router's
    decodable verdict for AIFF true): the COMM walk of parse_aiff_meta
    for the geometry, then the SSND chunk's sample frames — big-endian
    signed PCM for plain AIFF / AIFC 'NONE', little-endian for the
    'sowt' byte-swapped form — returned as (sample_rate, n_channels,
    float64 mono in [-1, 1]), decode_wav's exact contract. Compressed
    AIFC codecs raise ValueError (skip row)."""
    import struct

    import numpy as np

    meta = parse_aiff_meta(payload)
    if meta["codec"] != "pcm":
        raise ValueError(f"AIFF-C codec {meta['codec']} has no local decoder")
    bps = meta["bits_per_sample"]
    if bps not in (8, 16, 32):
        raise ValueError(f"unsupported AIFF sample width {bps}")
    # find the SSND chunk: 8-byte header + offset(4) + blocksize(4)
    swapped = meta["aiff_compression"] == "sowt"
    pos, raw = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from(">I", payload, pos + 4)
        if cid == b"SSND":
            (data_off,) = struct.unpack_from(">I", payload, pos + 8)
            raw = payload[pos + 16 + data_off : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    if raw is None:
        raise ValueError("AIFF payload has no SSND chunk")
    order = "<" if swapped else ">"
    if bps == 8:  # AIFF 8-bit is SIGNED, unlike WAV
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    else:
        dt = f"{order}i{bps // 8}"
        x = np.frombuffer(raw[: len(raw) // (bps // 8) * (bps // 8)], dtype=dt)
        x = x.astype(np.float64) / float(1 << (bps - 1))
    nch = meta["channels"] or 1
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    return meta["sample_rate"], nch, x


WAV_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, peak double"
)


def flac_features(df: DataFrame) -> DataFrame:
    """REAL audio features from FLAC payloads (r12 — the lossless twin
    of :func:`wav_features`, backed by the native functions/flac.py
    decoder: Rice residuals, fixed/LPC predictors, stereo
    decorrelation, CRC-verified frames): per doc (sample_rate,
    n_channels, n_samples, duration_s, rms, peak) over the genuinely
    decoded samples, mono-downmixed and scaled to [-1, 1] exactly as
    the WAV path reports them. Non-FLAC/torn payloads produce a
    n_samples = -1 skip row. Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from http_feeds_spark.functions.flac import decode_flac

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "peak",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    pcm, rate = decode_flac(bytes(payload))
                    x = pcm.mean(axis=1) / 32768.0
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(pcm.shape[1])
                    out["n_samples"].append(len(x))
                    out["duration_s"].append(len(x) / rate if rate else 0.0)
                    out["rms"].append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                    out["peak"].append(float(np.max(np.abs(x))) if len(x) else 0.0)
                except Exception:
                    out["sample_rate"].append(0)
                    out["n_channels"].append(0)
                    out["n_samples"].append(-1)
                    out["duration_s"].append(0.0)
                    out["rms"].append(0.0)
                    out["peak"].append(0.0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=WAV_SCHEMA)


def mp3_features(df: DataFrame) -> DataFrame:
    """REAL audio features from MP3 payloads (r14 — the lossy sibling of
    :func:`flac_features`, backed by the native functions/mp3.py Layer
    III decoder; its validated-table and synthesis-window provenance
    boundaries are documented there): per doc (sample_rate, n_channels,
    n_samples, duration_s, rms, peak) over the genuinely decoded mono
    samples on the same scale as the WAV path. Non-MP3 / torn /
    boundary-table payloads produce an n_samples = -1 skip row.
    Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from http_feeds_spark.functions.mp3 import decode_mp3

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "peak",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, nch, x = decode_mp3(bytes(payload))
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(nch)
                    out["n_samples"].append(len(x))
                    out["duration_s"].append(len(x) / rate if rate else 0.0)
                    out["rms"].append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                    out["peak"].append(float(np.max(np.abs(x))) if len(x) else 0.0)
                except Exception:
                    out["sample_rate"].append(0)
                    out["n_channels"].append(0)
                    out["n_samples"].append(-1)
                    out["duration_s"].append(0.0)
                    out["rms"].append(0.0)
                    out["peak"].append(0.0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=WAV_SCHEMA)


def wav_features(df: DataFrame) -> DataFrame:
    """REAL audio features from WAV payloads (stdlib decode, no external
    codec): per doc (sample_rate, n_channels, n_samples, duration_s,
    rms, peak) over the genuinely decoded mono samples (r12: AIFF and
    AIFF-C 'sowt' PCM decode through the same surface via decode_aiff —
    big-endian and byte-swapped sample orders, signed 8-bit). Non-audio
    payloads produce a null-stats row (n_samples = -1) rather than
    failing the batch — the skip-don't-crash rule of ingest. Map-only,
    Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "peak",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out["doc_id"].append(doc_id)
                try:
                    if b[:4] == b"FORM":  # r12: AIFF rides the same surface
                        rate, nch, x = decode_aiff(b)
                    elif b[:4] == b"RIFF":
                        rate, nch, x = decode_wav(b)
                    else:
                        raise ValueError("not a WAV/AIFF payload")
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(nch)
                    out["n_samples"].append(len(x))
                    out["duration_s"].append(len(x) / rate if rate else 0.0)
                    out["rms"].append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                    out["peak"].append(float(np.max(np.abs(x))) if len(x) else 0.0)
                except Exception:
                    out["sample_rate"].append(0)
                    out["n_channels"].append(0)
                    out["n_samples"].append(-1)
                    out["duration_s"].append(0.0)
                    out["rms"].append(0.0)
                    out["peak"].append(0.0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=WAV_SCHEMA)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """(type, data) for every chunk in stream order (CRCs not verified —
    a torn payload fails in zlib/shape checks downstream)."""
    import struct

    pos = 8
    while pos + 8 <= len(payload):
        length, = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        yield ctype, payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            break


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reverse the per-row PNG filters (spec §9: None/Sub/Up/Average/
    Paeth) into an (h, stride) uint8 array of raw scanline bytes.
    ``stride`` is the scanline byte length, ``bpp`` the filter's
    left-neighbor byte distance (max(1, bits-per-pixel // 8) per spec —
    1 for every sub-8-bit format). Up is vectorized; Sub/Average/Paeth
    carry a left-neighbor dependency and walk the row — rows are
    image-width-sized, and the whole decode runs inside an Arrow-batched
    worker, so the loop never touches the engine's hot path."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for r in range(h):
        f = raw[pos]
        cur = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub: left neighbor
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif f == 2:  # Up: row above, vectorized
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average of left and above, floor division
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} unsupported")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(payload: bytes):
    """REAL PNG decode with ZERO new dependencies: stdlib ``zlib``
    inflates the IDAT stream and numpy reverses the per-row filters.
    Covers every non-interlaced color type and depth — truecolor (2),
    truecolor+alpha (6), PALETTE (3, all legal depths 1/2/4/8 — icons,
    screenshots and charts, a large share of real web-crawl PNGs, ship
    paletted; r11 closes the skip), grayscale (0, depths 1/2/4/8/16,
    replicated to RGB), gray+alpha (4) and 16-bit channels (r11: the
    8-bit reduction is the network-order high byte, the spec's exact
    16→8 rescale). Palette indices resolve through the PLTE lookup
    table as a single numpy fancy-index on top of the shared
    inflate/unfilter path; a tRNS chunk is tolerated and dropped,
    exactly as RGBA's alpha channel is, so every decode_rgb format
    returns the same (H, W, 3) uint8 shape. Adam7 interlacing (r11)
    decodes via the seven per-pass filtered sub-images of spec §8.2 —
    PNG coverage is COMPLETE; only spec-illegal (16-bit palette,
    unknown color type) or torn payloads raise ValueError
    (skip-don't-crash at the operator layer)."""
    import struct
    import zlib

    import numpy as np

    ihdr = None
    idat = []
    plte = None
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if (
        nch is None
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
        or depth not in (1, 2, 4, 8, 16)
        or (depth < 8 and color not in (0, 3))
        or (depth == 16 and color == 3)  # the spec forbids 16-bit PLTE
    ):
        raise ValueError(
            f"PNG depth={depth} color={color} interlace={interlace} "
            "unsupported (no remaining format tiers — this is a torn or "
            "spec-illegal header)"
        )
    bpp = max(1, (nch * depth) // 8)
    raw = zlib.decompress(b"".join(idat))

    def samples(rows, ph, pw):
        """(ph, pw, nch) raw sample values from unfiltered scanline
        bytes: sub-8-bit samples unpack big-endian-within-byte (spec
        §7.2, byte-boundary padding dropped past pw); 16-bit reduces to
        the network-order high byte (the spec's exact 16→8 rescale)."""
        if depth < 8:
            bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
            v = bits.reshape(ph, pw, depth).astype(np.int32) @ weights
            return v.reshape(ph, pw, 1)
        if depth == 16:
            v = rows[:, 0::2][:, : pw * nch]
        else:
            v = rows[:, : pw * nch]
        return v.reshape(ph, pw, nch).astype(np.int32)

    if interlace == 0:
        stride = (w * nch * depth + 7) // 8  # scanline bytes, spec §7.2
        if len(raw) != h * (1 + stride):
            raise ValueError("PNG pixel data length mismatch")
        vals = samples(_png_unfilter(raw, h, stride, bpp), h, w)
    else:
        # Adam7 (r11, the last PNG tier): seven sub-images, each its own
        # filtered scanline run over the pass's (xo, yo, xs, ys) lattice;
        # empty passes contribute NO bytes (spec §8.2). Each pass
        # unfilters independently (prev-row zeros at its start) and
        # scatters into the full grid with one strided assignment.
        vals = np.zeros((h, w, nch), dtype=np.int32)
        pos = 0
        for xo, yo, xs, ys in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - xo + xs - 1) // xs
            ph = (h - yo + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * nch * depth + 7) // 8
            end = pos + ph * (1 + pstride)
            if end > len(raw):
                raise ValueError("PNG pixel data length mismatch")
            rows = _png_unfilter(raw[pos:end], ph, pstride, bpp)
            vals[yo::ys, xo::xs] = samples(rows, ph, pw)
            pos = end
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")

    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing its PLTE chunk")
        pal = np.frombuffer(plte, np.uint8)
        if len(pal) % 3 != 0:
            raise ValueError("PLTE length is not a multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = vals[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of PLTE range")
        return pal[idx].copy()
    if color == 0:
        if depth < 8:  # scale to full 8-bit range (15 -> 255 at depth 4)
            g = (vals[:, :, 0] * (255 // ((1 << depth) - 1))).astype(np.uint8)
        else:
            g = vals[:, :, 0].astype(np.uint8)
        return np.repeat(g.reshape(h, w, 1), 3, axis=2)
    img = vals.astype(np.uint8)
    if color == 4:  # gray+alpha: replicate the gray channel, drop alpha
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    return img[:, :, :3].copy()


def encode_png(img, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for (H, W, 3) uint8 arrays — the export twin
    of ``_decode_png`` (thumbnails from ``resize_rgb`` become real .png
    bytes with zero new dependencies). ``filter_type`` applies one
    filter (0-4) to every row; the decoder must invert all five, so the
    tests encode each and pin pixel identity."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("encode_png wants (H, W, 3) uint8")
    flat = a.reshape(h, w * ch).astype(np.int32)
    rows = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        cur = flat[r]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            filt = (cur - left) & 0xFF
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (cur - pred) & 0xFF
        else:
            raise ValueError(f"filter_type {filter_type} not in 0..4")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_palette(img) -> bytes:
    """Export twin of the r11 PLTE tier: (H, W, 3) uint8 with ≤256
    distinct colors becomes a depth-8 color-type-3 PNG — PLTE of the
    unique colors + one index byte per pixel (the icon/screenshot/chart
    encoding). Raises when the image has more colors than a palette
    holds (use encode_png). Pixel-identity with decode_rgb pinned."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("encode_png_palette wants (H, W, 3) uint8")
    colors, idx = np.unique(a.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed a palette")
    idx = idx.astype(np.uint8).reshape(h, w)
    rows = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", colors.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )


# the Adam7 pass lattice (x_origin, y_origin, x_step, y_step), spec §8.2
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_adam7(img) -> bytes:
    """Export twin of the r11 Adam7 tier: (H, W, 3) uint8 as an
    interlaced truecolor PNG — each of the seven passes serializes its
    sub-image as its own filter-0 scanline run (empty passes contribute
    no bytes, per spec §8.2). Pixel-identity with decode_rgb pinned."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("encode_png_adam7 wants (H, W, 3) uint8")
    out = b""
    for xo, yo, xs, ys in ADAM7_PASSES:
        sub = a[yo::ys, xo::xs]
        for r in range(sub.shape[0]):
            if sub.shape[1]:
                out += b"\x00" + sub[r].tobytes()
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + _png_chunk(b"IDAT", zlib.compress(out))
        + _png_chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, mcs: int) -> bytes:
    """GIF-variant LZW decode (spec appendix F): variable code width
    starting at mcs+1 bits, codes packed LSB-first, CLEAR = 2^mcs
    resets the table, END = CLEAR+1 stops, table capped at 12-bit
    codes. Returns the decoded palette-index bytes."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    entries: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    out: list = []
    prev = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without an END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            entries = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            return b"".join(out)
        if prev is None:
            if code >= len(entries):
                raise ValueError("GIF LZW first code out of table range")
            entry = entries[code]
        else:
            if code < len(entries):
                entry = entries[code]
            elif code == len(entries):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF LZW code out of table range")
            if len(entries) < 4096:  # table full: wait for CLEAR
                entries.append(prev + entry[:1])
                if len(entries) == (1 << width) and width < 12:
                    width += 1
        out.append(entry)
        prev = entry


def _gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF-variant LZW encode — the byte-exact twin of
    :func:`_gif_lzw_decode` (same width-growth rule: a code's bit
    width grows when the code count the DECODER would hold reaches
    2^width), emitting CLEAR first, re-CLEARing at the 12-bit table
    cap, END last, all packed LSB-first."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code, width = end + 1, mcs + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the encoder runs one table-add AHEAD of the decoder (it
            # adds on the code it emits; the decoder adds on the code
            # AFTER), so the growth conditions differ by one slot:
            # encoder grows after assigning code 2^width, decoder after
            # its entry count reaches 2^width — both then handle the
            # next code at width+1. Trace: mcs=2, run of zeros — codes
            # 0,6,7 at 3 bits, entry 8 assigned at the third emit →
            # both sides read/write the fourth code at 4 bits.
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset, as real encoders do
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = end + 1, mcs + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # spec §23: 4 passes


def _decode_gif(payload: bytes):
    """REAL GIF decode (r12, closing the last practically-decodable
    web format): stdlib-only LZW (appendix F) + the palette fancy-index
    path the r11 PNG work established. Decodes the FIRST image frame of
    a GIF87a/89a stream — the still-image tier; later animation frames
    are ignored — composed onto the logical screen initialized with the
    global-palette background color. Interlaced frames scatter through
    the four-pass row order of spec §23 with strided assignments, the
    Adam7 pattern. Extension blocks (GCE/comment/application) skip by
    their sub-block lengths; a GCE transparent index is dropped exactly
    as PNG tRNS/RGBA alpha is, so every decode_rgb format returns the
    same (H, W, 3) uint8 shape. Torn payloads raise ValueError
    (skip-don't-crash at the operator layer)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed, bg = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("GIF global color table truncated")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    def sub_blocks(p: int) -> tuple[bytes, int]:
        parts = []
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-block chain truncated")
            n = payload[p]
            p += 1
            if n == 0:
                return b"".join(parts), p
            parts.append(payload[p : p + n])
            if len(parts[-1]) != n:
                raise ValueError("GIF sub-block truncated")
            p += n

    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer before any image frame
            break
        if block == 0x21:  # extension: label byte + sub-block chain
            _, pos = sub_blocks(pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
        fpacked = payload[pos + 9]
        pos += 10
        pal = gct
        if fpacked & 0x80:  # local color table wins for this frame
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            if len(pal) != 3 * n:
                raise ValueError("GIF local color table truncated")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        mcs = payload[pos]
        if not 2 <= mcs <= 8:
            raise ValueError(f"GIF LZW minimum code size {mcs} out of range")
        data, pos = sub_blocks(pos + 1)
        idx = np.frombuffer(_gif_lzw_decode(data, mcs), np.uint8)
        if len(idx) != fw * fh:
            raise ValueError("GIF frame pixel count mismatch")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of table range")
        frame = pal[idx.reshape(fh, fw)]
        if fpacked & 0x40:  # interlaced: 4-pass row order, spec §23
            rows = np.empty((fh, fw, 3), dtype=np.uint8)
            r = 0
            for yo, ys in _GIF_INTERLACE_PASSES:
                n = len(range(yo, fh, ys))
                rows[yo::ys] = frame[r : r + n]
                r += n
            frame = rows
        if left + fw > sw or top + fh > sh:
            raise ValueError("GIF frame exceeds the logical screen")
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg < len(gct):
            canvas[:, :] = gct[bg]
        canvas[top : top + fh, left : left + fw] = frame
        return canvas
    raise ValueError("GIF stream has no image frame")


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """REAL animated-GIF decode (r12, the animation tier above
    :func:`_decode_gif`'s still tier): every frame composed onto the
    logical screen per the GIF89a animation protocol — the Graphic
    Control Extension's transparency index (transparent pixels show
    the canvas through) and disposal method (0/1 keep, 2 restore the
    background color over the frame rect, 3 restore the canvas as it
    was before the frame). Returns a list of (H, W, 3) uint8 arrays,
    one per composed frame — REAL frame sampling for the one animated
    container this engine decodes natively (``sample_frames`` remains
    the byte-slicing stand-in for true video). ``max_frames`` bounds
    the walk for triage-style use. Torn payloads raise ValueError."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed, bg = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("GIF global color table truncated")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    def sub_blocks(p: int) -> tuple[bytes, int]:
        parts = []
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-block chain truncated")
            n = payload[p]
            p += 1
            if n == 0:
                return b"".join(parts), p
            parts.append(payload[p : p + n])
            if len(parts[-1]) != n:
                raise ValueError("GIF sub-block truncated")
            p += n

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list = []
    disposal, transparent = 0, None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            body, pos = sub_blocks(pos + 2)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control Ext
                disposal = (body[0] >> 2) & 0x7
                transparent = body[3] if body[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
        fpacked = payload[pos + 9]
        pos += 10
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            if len(pal) != 3 * n:
                raise ValueError("GIF local color table truncated")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        mcs = payload[pos]
        if not 2 <= mcs <= 8:
            raise ValueError(f"GIF LZW minimum code size {mcs} out of range")
        data, pos = sub_blocks(pos + 1)
        idx = np.frombuffer(_gif_lzw_decode(data, mcs), np.uint8)
        if len(idx) != fw * fh:
            raise ValueError("GIF frame pixel count mismatch")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of table range")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:  # interlaced, spec §23
            rows = np.empty((fh, fw), dtype=np.uint8)
            r = 0
            for yo, ys in _GIF_INTERLACE_PASSES:
                n = len(range(yo, fh, ys))
                rows[yo::ys] = idx[r : r + n]
                r += n
            idx = rows
        if left + fw > sw or top + fh > sh:
            raise ValueError("GIF frame exceeds the logical screen")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = pal[idx][mask]
        else:
            region[:, :] = pal[idx]
        frames.append(canvas.copy())
        if disposal == 2:  # restore background over the frame rect
            canvas[top : top + fh, left : left + fw] = (
                gct[bg] if (gct is not None and bg < len(gct)) else 0
            )
        elif disposal == 3 and before is not None:
            canvas = before
        disposal, transparent = 0, None
        if max_frames is not None and len(frames) >= max_frames:
            return frames
    if not frames:
        raise ValueError("GIF stream has no image frame")
    return frames


def encode_gif_frames(
    frames,
    *,
    disposals=None,
    masks=None,
    positions=None,
    screen: tuple | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Animated-GIF writer — the twin of :func:`decode_gif_frames`.
    ``frames`` are (h, w, 3) uint8 arrays (possibly sub-rects);
    ``positions`` their (left, top) on the logical screen;
    ``disposals`` the per-frame GCE disposal methods; ``masks``
    optional boolean arrays marking TRANSPARENT pixels per frame (a
    reserved palette slot carries them). One shared global color table
    from the union of opaque colors (>255 raises — one slot is
    reserved for transparency)."""
    import struct

    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    n_f = len(frames)
    disposals = disposals or [0] * n_f
    masks = masks if masks is not None else [None] * n_f
    positions = positions or [(0, 0)] * n_f
    sw, sh = screen if screen is not None else (
        max(p[0] + f.shape[1] for p, f in zip(positions, frames)),
        max(p[1] + f.shape[0] for p, f in zip(positions, frames)),
    )
    opaque = [
        f.reshape(-1, 3) if m is None else f[~m]
        for f, m in zip(frames, masks)
    ]
    pal = np.unique(np.concatenate(opaque, axis=0), axis=0)
    if len(pal) > 255:
        raise ValueError(f"GIF palette overflow: {len(pal)} colors + transparency")
    trans_idx = len(pal)  # the reserved transparent slot
    nbits = max(1, int(trans_idx).bit_length())
    table = np.zeros((2 << (nbits - 1), 3), dtype=np.uint8)
    table[: len(pal)] = pal
    lut = {tuple(c): i for i, c in enumerate(pal.tolist())}
    mcs = max(2, nbits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (nbits - 1), 0, 0])
    out += table.tobytes()
    for f, m, d, (left, top) in zip(frames, masks, disposals, positions):
        h, w = f.shape[:2]
        gce = bytes([(d & 0x7) << 2 | (1 if m is not None else 0)])
        gce += struct.pack("<H", delay_cs)
        gce += bytes([trans_idx if m is not None else 0])
        out += b"\x21\xf9" + bytes([len(gce)]) + gce + b"\x00"
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3).tolist()], dtype=np.uint8
        ).reshape(h, w)
        if m is not None:
            idx[m] = trans_idx
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + bytes([0, mcs])
        lzw = _gif_lzw_encode(bytes(idx.reshape(-1)), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


GIF_FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, n_frames int, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def gif_frame_stats(df: DataFrame, max_frames: int = 16) -> DataFrame:
    """REAL animated-frame sampling (r12): one row per COMPOSED frame
    of each GIF payload via :func:`decode_gif_frames` — the genuine
    decode-and-measure pass ``sample_frames`` only stands in for on
    true video. ``max_frames`` bounds the per-payload walk (a corpus
    GIF can hold thousands of frames; triage decides who pays more).
    Non-GIF / torn payloads emit one ``n_frames = -1`` skip row.
    Map-only, Arrow-batched, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "frame_idx", "n_frames", "width", "height",
            "mean_r", "mean_g", "mean_b",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = decode_gif_frames(bytes(payload), max_frames=max_frames)
                except Exception:
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(-1)
                    out["n_frames"].append(-1)
                    out["width"].append(-1)
                    out["height"].append(-1)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    continue
                for i, fr in enumerate(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(len(frames))
                    out["height"].append(fr.shape[0])
                    out["width"].append(fr.shape[1])
                    out["mean_r"].append(float(fr[:, :, 0].mean()))
                    out["mean_g"].append(float(fr[:, :, 1].mean()))
                    out["mean_b"].append(float(fr[:, :, 2].mean()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=GIF_FRAMES_SCHEMA)


def encode_gif(img, *, interlace: bool = False, left: int = 0, top: int = 0,
               screen: tuple | None = None) -> bytes:
    """Minimal GIF89a writer for (H, W, 3) uint8 arrays — the lossless
    export twin of :func:`_decode_gif` (GIF is palette + LZW, both
    exact, so encode→decode pins pixel identity). Builds the global
    color table from the image's unique colors (>256 raises — that
    image belongs in PNG/JPEG); ``interlace`` writes the four-pass row
    order; ``left``/``top``/``screen`` place the frame on a larger
    logical screen for the composition path."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    sw, sh = screen if screen is not None else (left + w, top + h)
    flat = img.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF palette overflow: {len(pal)} unique colors")
    nbits = max(1, int(len(pal) - 1).bit_length())
    table = np.zeros((2 << (nbits - 1), 3), dtype=np.uint8)
    table[: len(pal)] = pal
    mcs = max(2, nbits)
    if interlace:
        order = np.concatenate(
            [np.arange(yo, h, ys) for yo, ys in _GIF_INTERLACE_PASSES]
        )
        indices = idx.reshape(h, w)[order].reshape(-1)
    else:
        indices = idx
    lzw = _gif_lzw_encode(bytes(indices.astype(np.uint8)), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (nbits - 1), 0, 0])  # GCT flag+size, bg 0, aspect
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    out += bytes([0x40 if interlace else 0, mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _decode_ico(payload: bytes):
    """ICO decode (r12): picks the LARGEST directory entry and decodes
    its image — either an embedded PNG (the modern form, routed through
    the complete PNG tier) or a headerless 32/24-bit or 8-bit-paletted (r13) BITMAPINFOHEADER
    DIB (height doubled for the AND mask, rows bottom-up, BGR(A)
    order; the AND mask is dropped like every alpha channel here).
    Sub-8-bit/16-bit DIB entries raise ValueError (skip row)."""
    import struct

    import numpy as np

    if payload[:4] != b"\x00\x00\x01\x00" or len(payload) < 22:
        raise ValueError("not an ICO payload")
    (n_images,) = struct.unpack_from("<H", payload, 4)
    if n_images == 0:
        raise ValueError("ICO directory is empty")
    best = None
    for i in range(n_images):
        at = 6 + 16 * i
        if at + 16 > len(payload):
            raise ValueError("torn ICO directory")
        w, h = payload[at] or 256, payload[at + 1] or 256
        size, off = struct.unpack_from("<II", payload, at + 8)
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, size, off)
    w, h, size, off = best
    img = payload[off : off + size]
    if len(img) != size:
        raise ValueError("ICO image data truncated")
    if img[:8] == PNG_MAGIC:
        return _decode_png(img)
    # headerless DIB: BITMAPINFOHEADER with doubled height
    if len(img) < 40:
        raise ValueError("torn ICO DIB header")
    hdr_size, biw, bih = struct.unpack_from("<Iii", img, 0)
    planes, bpp = struct.unpack_from("<HH", img, 12)
    (comp,) = struct.unpack_from("<I", img, 16)
    if comp != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"ICO DIB bpp={bpp} compression={comp} unsupported")
    bih //= 2  # XOR image + AND mask
    out = np.zeros((bih, biw, 3), dtype=np.uint8)
    if bpp == 8:
        # r13: the classic paletted favicon DIB — BGRX color table
        # right after the header, index rows bottom-up, AND mask
        # ignored like every alpha here
        (clr_used,) = struct.unpack_from("<I", img, 32)
        n_colors = clr_used or 256
        pal = np.frombuffer(
            img, np.uint8, n_colors * 4, hdr_size
        ).reshape(n_colors, 4)[:, 2::-1]
        px_off = hdr_size + n_colors * 4
        stride = (biw + 3) & ~3
        for r in range(bih):
            idx = np.frombuffer(img, np.uint8, biw, px_off + r * stride)
            out[bih - 1 - r] = pal[idx]
        return out
    nch = bpp // 8
    stride = (biw * nch + 3) & ~3
    for r in range(bih):
        row = np.frombuffer(img, np.uint8, biw * nch, hdr_size + r * stride)
        out[bih - 1 - r] = row.reshape(biw, nch)[:, 2::-1][:, :3]  # BGR(A)->RGB
    return out


def encode_ico(img, *, png: bool = True) -> bytes:
    """ICO writer — the twin of :func:`_decode_ico`: one entry wrapping
    either an embedded PNG (``png=True``, the modern form) or a 32-bit
    BGRA DIB with its doubled-height header and empty AND mask."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if h > 256 or w > 256:
        raise ValueError("ICO entries are at most 256x256")
    if png:
        data = encode_png(img)
    else:
        stride = (w * 4 + 3) & ~3
        body = bytearray()
        for r in range(h - 1, -1, -1):
            row = np.zeros((w, 4), dtype=np.uint8)
            row[:, 0] = img[r, :, 2]
            row[:, 1] = img[r, :, 1]
            row[:, 2] = img[r, :, 0]
            row[:, 3] = 255
            line = row.tobytes()
            body += line + b"\x00" * (stride - len(line))
        mask_stride = ((w + 31) // 32) * 4
        body += b"\x00" * (mask_stride * h)  # empty AND mask
        data = (
            struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, len(body), 0, 0, 0, 0)
            + bytes(body)
        )
    entry = bytes([w % 256, h % 256, 0, 0]) + struct.pack(
        "<HHII", 1, 32, len(data), 22
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + data


def decode_rgb(payload: bytes):
    """REAL image decode for the container-decodable formats: binary PPM
    (P6), uncompressed 24-bit BMP, PNG COMPLETE — every color type,
    depth and interlace mode: truecolor/RGBA, paletted,
    grayscale(+alpha), 16-bit, Adam7 (stdlib zlib inflate + numpy
    per-row unfiltering), GIF (r12: stdlib LZW + the palette path,
    first frame, interlace included), LOSSLESS WebP (r12:
    functions/vp8l.py — canonical prefix codes, LZ77, color cache,
    all four transforms), baseline TIFF (r12: functions/tiff.py —
    strips under none/LZW/Deflate/PackBits + predictor 2, both byte
    orders), and JPEG (r9/r11:
    functions/jpeg.py — Huffman entropy decode, dequant, batched float
    IDCT, chroma upsampling, YCbCr→RGB, baseline AND progressive;
    arithmetic-coded variants
    raise with the skip-row contract) — no external codec anywhere. Returns an
    (H, W, 3) uint8 array; raises ValueError for other formats (lossy WebP's
    VP8 arithmetic coder stays the documented boundary; video decode is
    functions/video.py's MJPEG-in-AVI tier)."""
    import struct

    import numpy as np

    if payload[:8] == PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from http_feeds_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from http_feeds_spark.functions.vp8l import decode_webp

        return decode_webp(payload)  # VP8L lossless; lossy VP8 raises
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from http_feeds_spark.functions.tiff import decode_tiff

        return decode_tiff(payload)  # baseline strips; exotic tiers raise
    if payload[:4] == b"\x00\x00\x01\x00":
        return _decode_ico(payload)  # embedded PNG or 32/24-bit DIB
    if payload[:2] in (b"P6", b"P5", b"P3", b"P2"):
        # Netpbm family (r12 widens P6-only): binary RGB (P6) and
        # grayscale (P5) share the header grammar — magic, whitespace/
        # comments, width height maxval, ONE whitespace byte, raw
        # samples; the ASCII forms (P3 RGB, P2 gray) carry
        # whitespace-separated decimal samples instead
        magic = payload[:2]
        nch = 3 if magic in (b"P6", b"P3") else 1
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if not 0 < maxval < 65536:
            raise ValueError(f"PNM maxval {maxval} out of the spec's range")
        n = w * h * nch
        if magic in (b"P6", b"P5"):
            if maxval > 255:  # two-byte big-endian raw samples per spec
                data = np.frombuffer(payload, dtype=">u2", count=n, offset=pos)
            else:
                data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
        else:  # ASCII samples, whitespace-separated (comments legal too)
            # comments run to end-of-line, so strip them LINE-wise before
            # tokenizing — '# made by foo' must drop ALL its words, not
            # just the token that starts with '#'
            toks = []
            for ln in payload[pos:].split(b"\n"):
                cut = ln.find(b"#")
                toks.extend((ln if cut < 0 else ln[:cut]).split())
                if len(toks) >= n:
                    break
            toks = toks[:n]
            if len(toks) < n:
                raise ValueError("ASCII PNM sample count short of dimensions")
            data = np.array([int(t) for t in toks], dtype=np.int64)
        if maxval != 255:
            # r13: any spec-legal maxval — scale to full 8-bit range
            # (rounded, the netpbm convention), instead of refusing
            data = (data.astype(np.int64) * 255 + maxval // 2) // maxval
        img = data.astype(np.uint8).reshape(h, w, nch)
        if nch == 1:
            return np.repeat(img, 3, axis=2).copy()
        return img.copy()
    if payload[:2] == b"BM":
        off, = struct.unpack_from("<I", payload, 10)
        hdr_size, = struct.unpack_from("<I", payload, 14)
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        comp, = struct.unpack_from("<I", payload, 30)
        # r13 widens 24-bit-only to the other common uncompressed forms:
        # 32-bit BGRA (alpha dropped, the convention everywhere here)
        # and 8-bit paletted (BGRX color table after the info header)
        if bpp not in (8, 24, 32) or comp != 0:
            raise ValueError(
                f"BMP bpp={bpp} compression={comp} unsupported (want 8/24/32, BI_RGB)"
            )
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
        img = np.zeros((h, w, 3), dtype=np.uint8)
        if bpp == 8:
            (clr_used,) = struct.unpack_from("<I", payload, 46)
            n_colors = clr_used or 256
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
            ).reshape(n_colors, 4)[:, 2::-1]  # BGRX → RGB
            for r in range(h):
                idx = np.frombuffer(payload, np.uint8, w, off + r * stride)
                img[h - 1 - r if flip else r] = pal[idx]
            return img
        for r in range(h):
            row = np.frombuffer(payload, dtype=np.uint8, count=w * nch, offset=off + r * stride)
            img[h - 1 - r if flip else r] = row.reshape(w, nch)[:, 2::-1][:, :3]  # BGR(A)→RGB
        return img
    raise ValueError(
        "not a PNG/JPEG/PPM/BMP payload (other compressed formats need decode_image)"
    )


IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double, mean_b double"
)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL per-image stats from genuinely decoded pixels (decode_rgb
    formats): dimensions + per-channel means. Undecodable payloads emit
    width = -1 (skip-don't-crash). Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_rgb(bytes(payload))
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    m = img.reshape(-1, 3).mean(axis=0)
                    out["mean_r"].append(float(m[0]))
                    out["mean_g"].append(float(m[1]))
                    out["mean_b"].append(float(m[2]))
                except Exception:
                    out["width"].append(-1)
                    out["height"].append(-1)
                    out["mean_r"].append(0.0)
                    out["mean_g"].append(0.0)
                    out["mean_b"].append(0.0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def resize_rgb(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """REAL nearest-neighbor resize of decode_rgb-able payloads: emits
    (doc_id, width, height, thumb) where thumb is raw RGB bytes of the
    (height, width, 3) result — sample-exact nearest-neighbor (numpy
    index arithmetic, the PIL NEAREST contract). Undecodable payloads
    emit width = -1 with an empty thumb. Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "thumb": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_rgb(bytes(payload))
                    sh, sw = img.shape[0], img.shape[1]
                    rows = (np.arange(height) * sh // height).clip(0, sh - 1)
                    cols = (np.arange(width) * sw // width).clip(0, sw - 1)
                    thumb = img[rows][:, cols]
                    out["width"].append(width)
                    out["height"].append(height)
                    out["thumb"].append(thumb.tobytes())
                except Exception:
                    out["width"].append(-1)
                    out["height"].append(-1)
                    out["thumb"].append(b"")
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    The worker function is defined inline (a closure) so cloudpickle
    serializes it BY VALUE: executors then don't need this package on
    their PYTHONPATH — the robust posture for pushing code to a cluster
    whose workers don't share the driver's filesystem.
    """
    feature_dim = FEATURE_DIM

    def fake_image_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # deterministic stand-in feature extractor (byte histogram) with
        # the same signature/batching a real image decoder would have
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                hist = [0.0] * feature_dim
                for byte in b:
                    hist[byte % feature_dim] += 1.0
                n = max(len(b), 1)
                feats.append([h / n for h in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(fake_image_features, schema=FEATURES_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash long, decoded boolean"


def _pack_dhash_bits(bits) -> int:
    """MSB-first bit pack into a signed 64-bit long (two's complement) —
    shared by the pixel and byte-fallback tiers so Hamming math and the
    banded block layout are identical across tiers."""
    h = 0
    for bit in bits:
        h = (h << 1) | int(bit)
    return h - (1 << 64) if h >= 1 << 63 else h


def _dhash_pixels(img, rows: int, cols: int) -> int:
    """Pixel-domain dHash: Rec.601 integer luma, area-mean downsample to
    a rows×(cols+1) grid (nearest-neighbor upsample first when the
    source is smaller than the grid), bit = cell brighter than its left
    neighbour. Area means (not single-pixel sampling) absorb the
    per-pixel wiggle of a JPEG re-encode; lossless containers of the
    same pixels hash IDENTICALLY because decode_rgb hands back the same
    (H, W, 3) array regardless of container."""
    import numpy as np

    a = img.astype(np.uint32)
    gray = 299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]  # luma ×1000
    gr, gc = rows, cols + 1
    sh, sw = gray.shape
    if sh < gr:
        gray = gray[(np.arange(gr) * sh) // gr]
        sh = gr
    if sw < gc:
        gray = gray[:, (np.arange(gc) * sw) // gc]
        sw = gc
    r_edges = (np.arange(gr) * sh) // gr
    c_edges = (np.arange(gc) * sw) // gc
    sums = np.add.reduceat(
        np.add.reduceat(gray.astype(np.float64), r_edges, axis=0), c_edges, axis=1
    )
    r_sizes = np.diff(np.append(r_edges, sh))
    c_sizes = np.diff(np.append(c_edges, sw))
    means = sums / (r_sizes[:, None] * c_sizes[None, :])
    return _pack_dhash_bits((means[:, 1:] > means[:, :-1]).flatten())


def synth_image(seed: int, height: int = 48, width: int = 64):
    """Deterministic structured test image — 8×8 color blocks whose
    palette is pure arithmetic in ``seed`` (no RNG: reproducible across
    executors and sessions, and ≤256 distinct colors so GIF/paletted
    containers round-trip losslessly). Shared by the phash/composition
    queries and their tests to plant the SAME pixels in many
    containers."""
    import numpy as np

    img = np.zeros((height, width, 3), np.uint8)
    for r in range(0, height, 8):
        for c in range(0, width, 8):
            # multiplicative mix so the BRIGHTNESS ORDERING of adjacent
            # blocks (what dHash compares) differs per seed, not just
            # the absolute colors
            m = ((r // 8) * (width // 8) + (c // 8) + 1) * (seed * 40503 + 12347)
            img[r : r + 8, c : c + 8] = [m % 251, (m >> 3) % 241, (m >> 7) % 239]
    return img


def perceptual_hash(df: DataFrame, rows: int = 8, cols: int = 8) -> DataFrame:
    """64-bit difference-hash (dHash) per image payload — the standard
    perceptual fingerprint for image near-dup (bit r·cols+c = cell
    brighter than its left neighbour on a (rows)×(cols+1) grayscale
    grid; robust to re-encode/resize, unlike a byte hash).

    REAL pixel path (r13): payloads :func:`decode_rgb` can decode —
    PNG/JPEG/GIF/BMP/PPM/VP8L/TIFF/ICO — are hashed from their PIXELS
    (:func:`_dhash_pixels`), so the SAME image shipped in different
    lossless containers hashes identically (Hamming 0) and a JPEG
    re-encode lands within a small Hamming budget — the dominant
    cross-container image-dup mode. Undecodable payloads keep the
    byte-grid fallback (skip-don't-crash; `decoded = false` marks the
    tier) — same sampling rule as before so byte-tier hashes are stable
    across releases. Map-only (Arrow-batched mapInPandas); pairs come
    later from Hamming pigeonhole banding
    (functions/minhash.simhash_candidates) — never an all-pairs scan."""
    n = rows * (cols + 1)

    def do_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hashes, decoded = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) or b"\x00"
                try:
                    img = decode_rgb(b)
                    hashes.append(_dhash_pixels(img, rows, cols))
                    decoded.append(True)
                    continue
                except Exception:
                    pass
                step = max(1, len(b) // n)
                grid = np.array(
                    [b[i * step % len(b)] for i in range(n)], dtype=np.int16
                ).reshape(rows, cols + 1)
                hashes.append(_pack_dhash_bits((grid[:, 1:] > grid[:, :-1]).flatten()))
                decoded.append(False)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": hashes, "decoded": decoded}
            )

    return df.select("doc_id", "payload").mapInPandas(do_hash, schema=PHASH_SCHEMA)


def phash_near_dup(df: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup pairs by perceptual hash: (a, b, hamming) for
    payload pairs whose dHashes differ in ≤ max_hamming bits.

    Candidates via the SAME 4×16-bit pigeonhole block equi-join the text
    SimHash path uses (pairs within Hamming 3·blocks guarantee; wider
    radii trade recall, documented there) — the phash column is packed
    into the (simhash, blk0..blk3) layout and handed to
    functions/minhash.simhash_candidates unchanged. Ids + one long
    through every exchange; no all-pairs join anywhere."""
    from http_feeds_spark.functions import minhash as mh

    sig = perceptual_hash(df).select(
        "doc_id",
        F.col("phash").alias("simhash"),
        *[
            F.shiftright(F.col("phash"), b * 16)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("int")
            .alias(f"blk{b}")
            for b in range(4)
        ],
    )
    return mh.simhash_candidates(sig, max_hamming=max_hamming)


RESIZED_SCHEMA = "doc_id long, width int, height int, thumb binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_off long, frame binary"
AUDIO_SCHEMA = (
    "doc_id long, n_samples long, rms double, peak double, n_clipped long"
)


def audio_features(df: DataFrame, frame_bytes: int = 2) -> DataFrame:
    """Audio feature extraction plumbing (mapInPandas, Arrow-batched).

    The real path decodes with soundfile/torchaudio and computes
    loudness/clipping stats over PCM samples; codecs are absent in this
    container, so the stand-in interprets the payload as `frame_bytes`-
    wide little-endian signed PCM samples (8/16/32-bit) — identical
    schema, batching, and numeric shape (per-row reduction over a sample
    vector). Map-only."""
    try:
        dtype, full_scale = {1: ("<i1", 128.0), 2: ("<i2", 32768.0), 4: ("<i4", 2147483648.0)}[
            frame_bytes
        ]
    except KeyError:
        raise ValueError(f"frame_bytes must be 1, 2, or 4 (signed PCM), got {frame_bytes}")

    def do_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "rms": [], "peak": [], "n_clipped": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                usable = len(b) - (len(b) % frame_bytes)
                samples = (
                    np.frombuffer(b[:usable], dtype=dtype).astype(np.float64) / full_scale
                    if usable
                    else np.zeros(1)
                )
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(samples))
                out["rms"].append(float(np.sqrt(np.mean(samples**2))))
                out["peak"].append(float(np.max(np.abs(samples))))
                out["n_clipped"].append(int((np.abs(samples) > 0.99).sum()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(do_features, schema=AUDIO_SCHEMA)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image-resize operator plumbing (mapInPandas, Arrow-batched).

    The real path would decode with PIL and `img.resize((w, h))`; codecs
    are absent in this container, so the stand-in emits a deterministic
    fixed-size byte grid sampled from the payload — same schema, batch
    shape, and partitioning as the real operator. Map-only: linear scale.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                b = bytes(payload) or b"\x00"
                step = max(1, len(b) // (width * height))
                thumbs.append(bytes(b[i * step % len(b)] for i in range(width * height)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "thumb": thumbs,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (row explosion inside mapInPandas — the batch-iterator shape a real
    ffmpeg-backed sampler would have). The stand-in cuts the payload into
    n_frames evenly spaced byte slices."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) or b"\x00"
                span = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    off = i * span
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame"].append(b[off : off + span])
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(do_sample, schema=FRAMES_SCHEMA)


# --- MP4 / ISO-BMFF metadata triage (r10) -----------------------------------
#
# Full video DECODE stays the documented import-gated boundary
# (decode_image), but what a training-data pipeline needs FIRST is
# metadata triage: duration, track count, resolution, codec fourcc —
# enough to route/filter/cost a corpus before any codec runs. The
# ISO-BMFF container (MPEG-4 Part 12) is a plain big-endian box tree,
# stdlib-struct parseable, the same way the WAV/PPM tier started in r7.

_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    buf[start:end]. Handles 64-bit largesize (size==1) and
    to-end-of-file (size==0). Raises ValueError on a torn box — a size
    running past the buffer means the payload is truncated/corrupt."""
    import struct

    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("torn ISO-BMFF box (largesize header truncated)")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"torn ISO-BMFF box {btype!r} (size {size})")
        yield btype, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing garbage after the last ISO-BMFF box")


def parse_mp4_meta(payload: bytes) -> dict:
    """ISO-BMFF (MP4/MOV/M4A) metadata triage — a stdlib-``struct`` box
    walk, NO codec anywhere: ``ftyp`` major brand, ``mvhd``
    timescale/duration (version 0 and 1 layouts), per-``trak`` handler
    (``hdlr``), presentation size (``tkhd``, 16.16 fixed point), and
    the first ``stsd`` sample-entry fourcc per track (the codec id —
    avc1/hev1/mp4a/...). Unknown box types are skipped (the format's
    own forward-compat rule); torn/truncated boxes raise ValueError —
    the Spark surface (:func:`probe_video_meta`) maps that to a
    skip-don't-crash row like every codec tier."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp box)")
    import struct

    meta: dict = {
        "major_brand": None,
        "timescale": 0,
        "duration_s": None,
        "n_tracks": 0,
        "width": 0,
        "height": 0,
        "video_codec": None,
        "audio_codec": None,
        # the first audio track's mdhd (media-header) timescale — for
        # audio this IS the sample rate; the mvhd movie timescale is
        # only the presentation clock and may be 600/1000 regardless of
        # the audio rate, so parse_audio_meta must never report it as
        # sample_rate. 0 = no audio track / mdhd absent (unknown).
        "audio_timescale": 0,
    }

    def walk(start: int, end: int, trak: dict | None = None) -> None:
        for btype, s, e in _iter_boxes(payload, start, end):
            if btype == b"ftyp":
                meta["major_brand"] = payload[s : s + 4].decode("ascii", "replace")
            elif btype == b"mvhd":
                version = payload[s]
                if version == 1:
                    ts, = struct.unpack_from(">I", payload, s + 20)
                    dur, = struct.unpack_from(">Q", payload, s + 24)
                else:
                    ts, dur = struct.unpack_from(">II", payload, s + 12)
                meta["timescale"] = ts
                meta["duration_s"] = (dur / ts) if ts else None
            elif btype == b"trak":
                t: dict = {}
                meta["n_tracks"] += 1
                walk(s, e, t)
                if t.get("handler") == b"vide" and meta["video_codec"] is None:
                    meta["video_codec"] = t.get("codec")
                    meta["width"] = t.get("width", 0)
                    meta["height"] = t.get("height", 0)
                elif t.get("handler") == b"soun" and meta["audio_codec"] is None:
                    meta["audio_codec"] = t.get("codec")
                    meta["audio_timescale"] = t.get("timescale", 0)
            elif btype == b"mdhd" and trak is not None:
                version = payload[s]
                # v0: ver/flags(4) ctime(4) mtime(4) timescale(4);
                # v1: ver/flags(4) ctime(8) mtime(8) timescale(4)
                at = s + (20 if version == 1 else 12)
                (trak["timescale"],) = struct.unpack_from(">I", payload, at)
            elif btype == b"tkhd" and trak is not None:
                version = payload[s]
                base = s + 4 + (32 if version == 1 else 20)  # past ids/durations
                w, h = struct.unpack_from(">II", payload, base + 52)
                trak["width"], trak["height"] = w >> 16, h >> 16
            elif btype == b"hdlr" and trak is not None:
                trak["handler"] = payload[s + 8 : s + 12]
            elif btype == b"stsd" and trak is not None:
                n_entries, = struct.unpack_from(">I", payload, s + 4)
                if n_entries > 0:
                    trak["codec"] = payload[s + 12 : s + 16].decode("ascii", "replace")
            elif btype in _BMFF_CONTAINERS:
                walk(s, e, trak)

    walk(0, len(payload))
    return meta


VIDEO_META_SCHEMA = (
    "doc_id long, major_brand string, duration_s double, timescale int, "
    "n_tracks int, width int, height int, video_codec string, audio_codec string"
)


def probe_video_meta(df: DataFrame) -> DataFrame:
    """Corpus-wide video triage: one metadata row per payload via
    :func:`parse_mp4_meta`. Non-ISO-BMFF / torn payloads emit
    ``n_tracks = -1`` (skip-don't-crash, the image_stats convention).
    Map-only, Arrow-batched, no shuffle — the triage that decides which
    payloads are worth a real (external) decoder at 100 TB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "major_brand", "duration_s", "timescale",
            "n_tracks", "width", "height", "video_codec", "audio_codec",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    m = parse_mp4_meta(bytes(payload))
                    for k in cols[1:]:
                        out[k].append(m[k])
                except Exception:
                    out["major_brand"].append(None)
                    out["duration_s"].append(None)
                    out["timescale"].append(0)
                    out["n_tracks"].append(-1)
                    out["width"].append(0)
                    out["height"].append(0)
                    out["video_codec"].append(None)
                    out["audio_codec"].append(None)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=VIDEO_META_SCHEMA)


# --- audio triage (r11): MP3 / FLAC / WAV header metadata, NO decode --------

# MPEG audio bitrate tables, kbps (index 0 = free, 15 = bad) — ISO 11172-3
# table rows keyed by (version_group, layer): v1 = MPEG1, v2 = MPEG2/2.5
_MP3_BITRATES = {
    ("v1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("v1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("v1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("v2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("v2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("v2", 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _skip_id3v2(payload: bytes) -> int:
    """Offset past a leading ID3v2 tag (syncsafe size + optional
    footer), or 0 when there is none — shared by the MPEG-audio and
    ADTS walks; both wire formats ship ID3-prefixed in the wild."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        size = (size << 7) | (b & 0x7F)
    return 10 + size + (10 if payload[5] & 0x10 else 0)


def _mp3_frame(payload: bytes, pos: int):
    """Parse the 4-byte MPEG audio frame header at ``pos`` → (frame_len,
    meta dict) or None when the bytes are not a valid header (the
    false-sync filter)."""
    if pos + 4 > len(payload):
        return None
    b1, b2, b3, b4 = payload[pos : pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    vbits = (b2 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    lbits = (b2 >> 1) & 3  # 3=Layer I, 2=Layer II, 1=Layer III
    if vbits == 1 or lbits == 0:
        return None
    layer = {3: 1, 2: 2, 1: 3}[lbits]
    vgroup = "v1" if vbits == 3 else "v2"
    bi, ri = (b3 >> 4) & 15, (b3 >> 2) & 3
    if bi in (0, 15) or ri == 3:
        return None
    bitrate = _MP3_BITRATES[(vgroup, layer)][bi]
    rate = _MP3_RATES[vbits][ri]
    padding = (b3 >> 1) & 1
    mode = (b4 >> 6) & 3
    if layer == 1:
        spf = 384
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 576 if (layer == 3 and vgroup == "v2") else 1152
        flen = spf // 8 * bitrate * 1000 // rate + padding
    return flen, {
        "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[vbits],
        "layer": layer,
        "sample_rate": rate,
        "channels": 1 if mode == 3 else 2,
        "bitrate_kbps": bitrate,
        "spf": spf,
        "mpeg1": vgroup == "v1",
    }


def parse_mp3_meta(payload: bytes) -> dict:
    """MPEG audio (MP3) metadata triage — header walk, NO decode: skips
    a leading ID3v2 tag (syncsafe size), validates the sync by requiring
    the SECOND frame to parse at the first frame's computed length (the
    classic false-sync filter), reads the Xing/Info VBR header when
    present (frame count → exact duration; 'Xing' = VBR, 'Info' = CBR),
    else walks every frame header counting frames — duration =
    frames × samples-per-frame / sample-rate either way. Torn streams
    (no two consecutive valid frames) raise ValueError; the Spark
    surface maps that to the skip row."""
    import struct

    pos = _skip_id3v2(payload)
    first = _mp3_frame(payload, pos)
    if first is None:
        raise ValueError("no MPEG audio frame sync")
    flen, m = first
    end1 = pos + flen
    if end1 > len(payload):
        raise ValueError("first MPEG frame truncated")
    if end1 + 4 <= len(payload) and _mp3_frame(payload, end1) is None:
        raise ValueError("second frame does not sync (false sync or torn)")

    # Xing/Info header: after the Layer III side info of the first frame
    n_frames = None
    vbr = False
    if m["layer"] == 3:
        side = (32 if m["channels"] == 2 else 17) if m["mpeg1"] else (17 if m["channels"] == 2 else 9)
        tag_at = pos + 4 + side
        tag = payload[tag_at : tag_at + 4]
        if tag in (b"Xing", b"Info"):
            vbr = tag == b"Xing"
            (flags,) = struct.unpack_from(">I", payload, tag_at + 4)
            if flags & 1:
                (n_frames,) = struct.unpack_from(">I", payload, tag_at + 8)
    if n_frames is None:
        # walk the frame headers (bounded by the payload)
        n_frames, p, rates = 0, pos, set()
        while True:
            f = _mp3_frame(payload, p)
            if f is None or p + f[0] > len(payload):
                break
            n_frames += 1
            rates.add(f[1]["bitrate_kbps"])
            p += f[0]
        vbr = len(rates) > 1
    duration = (n_frames * m["spf"] / m["sample_rate"]) if n_frames else None
    out = {
        "codec": f"mp3/{m['version']}-L{m['layer']}",
        "sample_rate": m["sample_rate"],
        "channels": m["channels"],
        "bits_per_sample": 0,  # lossy: no fixed sample width
        "bitrate_kbps": m["bitrate_kbps"],
        "duration_s": duration,
        "vbr": vbr,
        "n_frames": int(n_frames or 0),
    }
    if m["layer"] == 3:
        out["sub_decodable"] = _mp3_sub_decodable(payload)
    return out


def _mp3_sub_decodable(payload: bytes, probe_frames: int = 4) -> bool:
    """Per-payload decode-tier probe for Layer III (r15, the audio twin
    of the TIFF/ICO image ``sub_decodable`` hints): walk the first few
    frames' SIDE INFO ONLY — no Huffman decode — and report whether
    functions/mp3.py's documented boundaries (the one unvalidated
    Huffman table 10, intensity stereo) would refuse the stream. Without
    this, every typical-bitrate real-world MP3 routes into the audiofp
    Arrow passes decodable=True and then yields nothing; with it the
    routing bit means what it means for images. Only tables selected by
    regions that big_values actually reaches count — an unsupported
    table_select for an empty region never executes."""
    from http_feeds_spark.functions import mp3 as _mp3

    try:
        for fno, (fhdr, fsi, _main) in enumerate(_mp3.iter_frames(payload)):
            if fhdr["mode"] == _mp3.MODE_JOINT and (fhdr["mode_ext"] & 1):
                return False  # intensity stereo boundary
            for gr in fsi["granules"]:
                for g in gr:
                    bv2 = g["big_values"] * 2
                    if not bv2:
                        continue
                    r0, r1 = _mp3._region_boundaries(fhdr, g)
                    used = [g["table_select"][0]]
                    if bv2 > r0:
                        used.append(g["table_select"][1])
                    if bv2 > r1:
                        used.append(g["table_select"][2])
                    if any(t not in _mp3.SUPPORTED_TABLES for t in used):
                        return False
            if fno + 1 >= probe_frames:
                break
        return True
    except Exception:
        return False


def parse_flac_meta(payload: bytes) -> dict:
    """FLAC metadata triage — the mandatory STREAMINFO block (the spec
    requires it first): 20-bit sample rate, 3-bit channels−1, 5-bit
    bits-per-sample−1, 36-bit total samples → EXACT duration, no frame
    walk needed. Mean bitrate derives from payload size over duration.
    Torn/non-FLAC payloads raise ValueError."""
    import struct

    if payload[:4] != b"fLaC" or len(payload) < 4 + 4 + 34:
        raise ValueError("not a FLAC payload")
    btype = payload[4] & 0x7F
    (blen,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if btype != 0 or blen != 34:
        raise ValueError("FLAC stream does not lead with STREAMINFO")
    s = payload[8:42]
    bits = int.from_bytes(s[10:18], "big")  # sr(20) ch(3) bps(5) total(36)
    sr = bits >> 44
    ch = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    if sr == 0:
        raise ValueError("FLAC STREAMINFO has zero sample rate")
    duration = total / sr if total else None
    return {
        "codec": "flac",
        "sample_rate": sr,
        "channels": ch,
        "bits_per_sample": bps,
        "bitrate_kbps": int(len(payload) * 8 / duration / 1000) if duration else 0,
        "duration_s": duration,
        "vbr": True,  # FLAC frames are variable-size by construction
        "n_frames": 0,  # unknown without a frame walk; STREAMINFO suffices
    }


def parse_wav_meta(payload: bytes) -> dict:
    """RIFF/WAVE metadata triage — fmt/data chunk walk, header bytes
    only (no sample read, unlike wav_features): codec = 'pcm' for
    format 1, 'wave_fmt_N' otherwise; exact duration from data size
    over byte rate."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data_size = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAVE payload has no fmt chunk")
    audio_fmt, ch, sr, byte_rate, _align, bps = fmt
    duration = (data_size / byte_rate) if (data_size and byte_rate) else None
    return {
        "codec": "pcm" if audio_fmt == 1 else f"wave_fmt_{audio_fmt}",
        "sample_rate": sr,
        "channels": ch,
        "bits_per_sample": bps,
        "bitrate_kbps": byte_rate * 8 // 1000 if byte_rate else 0,
        "duration_s": duration,
        "vbr": False,
        "n_frames": 0,
    }


def parse_ogg_meta(payload: bytes) -> dict:
    """Ogg (Opus / Vorbis) metadata triage — page-header walk, NO
    decode: the FIRST page carries the codec id header ('OpusHead':
    channel count, pre-skip, input rate — the granule clock is always
    48 kHz; '\\x01vorbis': channels + rate little-endian), and the LAST
    page's granule position is the total sample count, so duration =
    granule / clock exactly (minus Opus pre-skip, per RFC 7845).

    The last page is found by walking pages FORWARD from offset 0 via
    each page's segment table — never by scanning backwards for the
    capture pattern, which is not escaped inside packet bytes, so a
    false 'OggS' match in compressed Opus/Vorbis data would yield a
    garbage granule (or a struct.error near the payload tail). A
    stream whose tail page is torn still reports the duration as of
    the last COMPLETE page. All malformed-stream failures raise
    ValueError (the documented skip-don't-crash contract)."""
    import struct

    if payload[:4] != b"OggS" or len(payload) < 28:
        raise ValueError("not an Ogg payload")

    # Forward page walk: RFC 3533 page = 27-byte header + nseg lacing
    # values + body of sum(lacing) bytes. Collect the granule position
    # of every complete page; -1 granules (no packet ends on the page)
    # do not advance the clock.
    pos, granule, first = 0, -1, b""
    try:
        while pos + 27 <= len(payload):
            if payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
                raise ValueError(f"bad Ogg page header at offset {pos}")
            nseg = payload[pos + 26]
            body_at = pos + 27 + nseg
            if body_at > len(payload):
                break  # torn final page: keep the last complete granule
            body_len = sum(payload[pos + 27 : body_at])
            if body_at + body_len > len(payload):
                break
            (g,) = struct.unpack_from("<q", payload, pos + 6)
            if g >= 0:
                granule = g
            if pos == 0:
                first = payload[body_at : body_at + body_len]
            pos = body_at + body_len
        if pos == 0:
            raise ValueError("first Ogg page is torn")
    except ValueError:
        raise
    except Exception as exc:  # struct.error etc. → the documented contract
        raise ValueError(f"malformed Ogg stream: {exc}") from exc

    if first[:8] == b"OpusHead":
        ch = first[9]
        pre_skip = struct.unpack_from("<H", first, 10)[0]
        clock, codec, sr = 48000, "opus", 48000
    elif first[:7] == b"\x01vorbis":
        ch = first[11]
        sr = struct.unpack_from("<I", first, 12)[0]
        clock, codec, pre_skip = sr, "vorbis", 0
        if sr == 0:
            raise ValueError("vorbis id header has zero sample rate")
    else:
        raise ValueError("Ogg stream is neither Opus nor Vorbis")
    duration = max(granule - pre_skip, 0) / clock if granule >= 0 else None
    return {
        "codec": codec,
        "sample_rate": sr,
        "channels": ch,
        "bits_per_sample": 0,  # lossy
        "bitrate_kbps": int(len(payload) * 8 / duration / 1000) if duration else 0,
        "duration_s": duration,
        "vbr": True,  # both codecs are VBR by construction
        "n_frames": 0,
    }


# ADTS sampling-frequency index table (ISO 14496-3 §1.6.3.4); indices
# 13/14 are reserved and 15 is the escape value — all three refuse.
_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)
_ADTS_PROFILES = ("Main", "LC", "SSR", "LTP")


def _adts_frame(payload: bytes, pos: int):
    """Parse the 7/9-byte ADTS frame header at ``pos`` → (frame_len,
    meta dict) or None when the bytes are not a valid header (the
    false-sync filter, exactly the MP3 discipline). Layer bits must be
    00 — which is also what keeps ADTS and MPEG-audio syncs disjoint:
    an MP3 header has nonzero layer bits at the same offset."""
    if pos + 7 > len(payload):
        return None
    b0, b1, b2, b3, b4, b5, b6 = payload[pos : pos + 7]
    if b0 != 0xFF or (b1 & 0xF6) != 0xF0:  # sync 0xFFF + layer 00
        return None
    sfi = (b2 >> 2) & 0xF
    if sfi >= len(_ADTS_RATES):
        return None
    flen = ((b3 & 0x3) << 11) | (b4 << 3) | (b5 >> 5)
    crc_absent = b1 & 1
    if flen < (7 if crc_absent else 9):
        return None
    return flen, {
        "version": "MPEG2" if (b1 >> 3) & 1 else "MPEG4",
        "profile": _ADTS_PROFILES[(b2 >> 6) & 3],
        "sample_rate": _ADTS_RATES[sfi],
        "channels": ((b2 & 1) << 2) | (b3 >> 6),  # config 0 = in-band PCE
        "blocks": (b6 & 3) + 1,  # AAC frames in this ADTS frame, 1024 samples each
    }


def parse_adts_meta(payload: bytes) -> dict:
    """Raw AAC-in-ADTS metadata triage (r12) — the 7-byte frame-header
    walk beside the MP3 one: syncword + layer-00 filter, MPEG-2/4
    version bit, profile, the sampling-frequency-index table, channel
    configuration, and the 13-bit frame length that chains the walk.
    Duration = sum of per-frame AAC block counts x 1024 / sample rate;
    mean bitrate from payload size over duration; VBR when frame
    lengths differ. Torn streams (no two consecutive valid frames)
    raise ValueError — the probe surface maps that to the skip row."""
    pos = _skip_id3v2(payload)
    first = _adts_frame(payload, pos)
    if first is None:
        raise ValueError("no ADTS frame sync")
    flen, m = first
    end1 = pos + flen
    if end1 > len(payload):
        raise ValueError("first ADTS frame truncated")
    if end1 + 7 <= len(payload) and _adts_frame(payload, end1) is None:
        raise ValueError("second ADTS frame does not sync (false sync or torn)")

    n_frames, blocks, p, lengths = 0, 0, pos, set()
    while True:
        f = _adts_frame(payload, p)
        if f is None or p + f[0] > len(payload):
            break
        n_frames += 1
        blocks += f[1]["blocks"]
        lengths.add(f[0])
        p += f[0]
    duration = blocks * 1024 / m["sample_rate"] if blocks else None
    return {
        "codec": f"aac/{m['version']}-{m['profile']}",
        "sample_rate": m["sample_rate"],
        "channels": m["channels"],
        "bits_per_sample": 0,  # lossy
        "bitrate_kbps": int(len(payload) * 8 / duration / 1000) if duration else 0,
        "duration_s": duration,
        "vbr": len(lengths) > 1,
        "n_frames": n_frames,
    }


def parse_aiff_meta(payload: bytes) -> dict:
    """AIFF / AIFF-C metadata triage (r12) — the big-endian IFF twin of
    the RIFF/WAVE walk: FORM container, COMM chunk (channels, sample
    frames, bit depth, and the sample rate as an 80-bit IEEE 754
    extended float — sign + 15-bit exponent biased 16383 + explicit
    64-bit mantissa), duration = frames / rate exactly. AIFF-C reports
    the compression fourcc as the codec ('NONE'/'sowt' = PCM); torn or
    COMM-less payloads raise ValueError."""
    import struct

    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    aifc = payload[8:12] == b"AIFC"
    pos, comm = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from(">I", payload, pos + 4)
        if cid == b"COMM":
            comm = payload[pos + 8 : pos + 8 + clen]
            if len(comm) < 18:
                raise ValueError("AIFF COMM chunk truncated")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if comm is None:
        raise ValueError("AIFF payload has no COMM chunk")
    ch, frames, bps = struct.unpack_from(">HIH", comm, 0)
    # 80-bit extended float: value = mantissa * 2^(exp - 16383 - 63)
    (se,) = struct.unpack_from(">H", comm, 8)
    mant = int.from_bytes(comm[10:18], "big")
    exp = se & 0x7FFF
    if mant == 0 or exp == 0:
        sr = 0.0
    elif exp == 0x7FFF:
        raise ValueError("AIFF sample rate is NaN/Inf")
    else:
        sr = mant * 2.0 ** (exp - 16383 - 63)
    if se & 0x8000 or sr <= 0 or sr != sr:
        raise ValueError("AIFF sample rate out of range")
    codec, four = "pcm", "NONE"
    if aifc and len(comm) >= 22:
        four = comm[18:22].decode("ascii", "replace")
        codec = "pcm" if four in ("NONE", "sowt") else four
    duration = frames / sr if frames else None
    return {
        "codec": codec,
        "sample_rate": int(round(sr)),
        "channels": ch,
        "bits_per_sample": bps,
        "bitrate_kbps": int(len(payload) * 8 / duration / 1000) if duration else 0,
        "duration_s": duration,
        "vbr": False,
        "n_frames": 0,
        # the raw AIFC compression fourcc ('NONE' for plain AIFF) —
        # decode_aiff needs the 'sowt' byte-order distinction the
        # shared codec string folds away
        "aiff_compression": four,
    }


def parse_audio_meta(payload: bytes) -> dict:
    """Dispatch by container magic: FLAC / RIFF-WAVE / AIFF(-C) (r12) /
    Ogg(Opus,Vorbis) / M4A (ISO-BMFF with an audio track — routed
    through the r10 box walk and mapped onto the audio schema) / raw
    AAC-in-ADTS (layer bits 00 at the sync, r12) / MPEG-audio (bare
    sync or ID3v2-prefixed; layer bits nonzero). Anything else raises
    ValueError — the probe_audio_meta surface maps that to a skip
    row."""
    if payload[:4] == b"fLaC":
        return parse_flac_meta(payload)
    if payload[:4] == b"RIFF":
        return parse_wav_meta(payload)
    if payload[:4] == b"FORM":
        return parse_aiff_meta(payload)
    if payload[:4] == b"OggS":
        return parse_ogg_meta(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        m = parse_mp4_meta(payload)
        if m["audio_codec"] is None:
            raise ValueError("ISO-BMFF payload has no audio track")
        return {
            "codec": m["audio_codec"],
            # the audio track's mdhd timescale IS the sample rate; the
            # mvhd movie timescale is only the presentation clock (often
            # 600/1000) and must never be reported here — 0 = unknown,
            # like channels/bits_per_sample.
            "sample_rate": m["audio_timescale"],
            "channels": 0,  # not in the box headers we walk
            "bits_per_sample": 0,
            "bitrate_kbps": (
                int(len(payload) * 8 / m["duration_s"] / 1000)
                if m["duration_s"]
                else 0
            ),
            "duration_s": m["duration_s"],
            "vbr": True,
            "n_frames": 0,
        }
    # the two bare-sync wire formats are disjoint at the layer bits:
    # ADTS carries 00 where MPEG-audio carries a nonzero layer
    p = _skip_id3v2(payload)
    if p + 2 <= len(payload) and payload[p] == 0xFF and (payload[p + 1] & 0xF6) == 0xF0:
        return parse_adts_meta(payload)
    return parse_mp3_meta(payload)


AUDIO_META_SCHEMA = (
    "doc_id long, codec string, sample_rate int, channels int, "
    "bits_per_sample int, bitrate_kbps int, duration_s double, "
    "vbr boolean, n_frames int"
)


def probe_audio_meta(df: DataFrame) -> DataFrame:
    """Corpus-wide audio triage (r11, the audio sibling of
    :func:`probe_video_meta`): one metadata row per payload via
    :func:`parse_audio_meta` — codec, sample rate, channels, bit depth,
    bitrate, duration, VBR flag — with NO sample decode anywhere.
    Non-audio / torn payloads emit ``sample_rate = -1``
    (skip-don't-crash). Map-only, Arrow-batched, no shuffle — the
    decide-before-you-decode pass a 100 TB audio corpus runs first."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "codec", "sample_rate", "channels",
            "bits_per_sample", "bitrate_kbps", "duration_s", "vbr", "n_frames",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    m = parse_audio_meta(bytes(payload))
                    for k in cols[1:]:
                        out[k].append(m[k])
                except Exception:
                    out["codec"].append(None)
                    out["sample_rate"].append(-1)
                    out["channels"].append(0)
                    out["bits_per_sample"].append(0)
                    out["bitrate_kbps"].append(0)
                    out["duration_s"].append(None)
                    out["vbr"].append(None)
                    out["n_frames"].append(0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_META_SCHEMA)


# --- image triage (r11): header-only format/dimensions, NO decode ----------


def parse_image_meta(payload: bytes) -> dict:
    """Header-only image metadata — format, dimensions, bit depth,
    color/progressive flags — with NO pixel decode: PNG (IHDR fields
    incl. the interlace flag), JPEG (marker walk to the first SOFn —
    progressive = SOF2, components, precision), GIF (logical screen
    descriptor; 87a/89a), BMP (BITMAPINFOHEADER), binary PPM (ASCII
    header), WebP (VP8 key-frame dims / VP8L 14-bit packed dims —
    triaged as the decodable ``webp_lossless`` since r12 — / VP8X
    canvas-minus-one), TIFF (r12: either byte order, first-IFD tag
    walk for dims / bits-per-sample / samples-per-pixel), and ICO
    (r12: directory header, 0 encoding 256). Torn or unrecognized
    payloads raise ValueError; probe_image_meta maps that to the skip
    row. The decide-before-you-decode pass for a 100 TB image corpus:
    resolution/format filters run on this, and only survivors pay a
    real decoder."""
    import struct

    if payload[:8] == PNG_MAGIC and len(payload) >= 33:
        w, h, depth, color, _c, _f, interlace = struct.unpack_from(">IIBBBBB", payload, 16)
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color, 0)
        return {
            "format": "png", "width": w, "height": h,
            "bit_depth": depth, "n_channels": nch,
            "progressive": bool(interlace),  # Adam7 is PNG's progressive
        }
    if payload[:2] == b"\xff\xd8":  # JPEG: walk to the first SOF marker
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                prec, h, w, nc = struct.unpack_from(">BHHB", payload, pos + 4)
                return {
                    "format": "jpeg", "width": w, "height": h,
                    "bit_depth": prec, "n_channels": nc,
                    "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
                }
            pos += 2 + seglen
        raise ValueError("JPEG payload has no SOF marker")
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 13:
        w, h = struct.unpack_from("<HH", payload, 6)
        gct = payload[10]
        return {
            "format": "gif", "width": w, "height": h,
            "bit_depth": ((gct >> 4) & 7) + 1, "n_channels": 1,  # palette
            "progressive": False,  # per-frame interlace lives deeper
        }
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0] if len(payload) >= 30 else 0
        comp = struct.unpack_from("<I", payload, 30)[0] if len(payload) >= 34 else 0
        return {
            "format": "bmp", "width": abs(w), "height": abs(h),
            "bit_depth": bpp, "n_channels": 3, "progressive": False,
            # mirror decode_rgb's BMP envelope (8/24/32-bit BI_RGB)
            "sub_decodable": bpp in (8, 24, 32) and comp == 0,
        }
    if payload[:2] in (b"P6", b"P5", b"P3", b"P2"):
        # Netpbm ASCII header: magic, width, height, maxval (comments
        # allowed); r12 widens the P6-only triage to the gray (P5/P2)
        # and ASCII (P3/P2) forms decode_rgb now reads
        toks, i, cur = [], 2, b""
        while i < len(payload) and len(toks) < 3:
            c = payload[i : i + 1]
            if c == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                if cur:
                    toks.append(cur)
                    cur = b""
            else:
                cur += c
            i += 1
        if len(toks) < 3:
            raise ValueError("torn PPM header")
        w, h, maxval = (int(t) for t in toks)
        return {
            "format": "ppm", "width": w, "height": h,
            "bit_depth": 16 if maxval > 255 else 8,
            "n_channels": 3 if payload[:2] in (b"P6", b"P3") else 1,
            "progressive": False,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP" and len(payload) >= 25:
        fourcc = payload[12:16]
        if fourcc == b"VP8 ":  # lossy: key-frame dims at the start tag
            if len(payload) < 30 or payload[23:26] != b"\x9d\x01\x2a":
                raise ValueError("WebP VP8 key-frame start code missing")
            w, h = struct.unpack_from("<HH", payload, 26)
            return {"format": "webp", "width": w & 0x3FFF, "height": h & 0x3FFF,
                    "bit_depth": 8, "n_channels": 3, "progressive": False}
        if fourcc == b"VP8L":  # lossless: 14-bit minus-one packed dims
            if payload[20] != 0x2F:
                raise ValueError("WebP VP8L signature byte missing")
            bits = int.from_bytes(payload[21:25], "little")
            # distinguished from lossy 'webp': the lossless variant is
            # locally DECODABLE (functions/vp8l.py, r12), so the router
            # must route the two differently
            return {"format": "webp_lossless", "width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1,
                    "bit_depth": 8, "n_channels": 4 if (bits >> 28) & 1 else 3,
                    "progressive": False}
        if fourcc == b"VP8X":  # extended: 24-bit canvas-minus-one
            if len(payload) < 30:
                raise ValueError("torn WebP VP8X header")
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return {"format": "webp", "width": w, "height": h,
                    "bit_depth": 8,
                    "n_channels": 4 if payload[20] & 0x10 else 3,
                    "progressive": False}
        raise ValueError(f"unknown WebP chunk {fourcc!r}")
    if payload[:4] in (b"II*\x00", b"MM\x00*"):  # TIFF, either byte order
        endian = "<" if payload[:2] == b"II" else ">"
        (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
        if ifd_off + 2 > len(payload):
            raise ValueError("torn TIFF IFD offset")
        (n_entries,) = struct.unpack_from(endian + "H", payload, ifd_off)
        tags: dict = {}
        for i in range(n_entries):
            at = ifd_off + 2 + 12 * i
            if at + 12 > len(payload):
                raise ValueError("torn TIFF IFD entry")
            tag, typ, count = struct.unpack_from(endian + "HHI", payload, at)
            # inline value when it fits 4 bytes: SHORT(3)=2B, LONG(4)=4B
            if typ == 3:
                (val,) = struct.unpack_from(endian + "H", payload, at + 8)
            elif typ == 4:
                (val,) = struct.unpack_from(endian + "I", payload, at + 8)
            else:
                continue
            if tag == 258 and count > 1:
                # BitsPerSample with count>1 stores an OFFSET to the
                # per-sample shorts; read the first
                (off,) = struct.unpack_from(endian + "I", payload, at + 8)
                if off + 2 <= len(payload):
                    (val,) = struct.unpack_from(endian + "H", payload, off)
            tags[tag] = val
        if 256 not in tags or 257 not in tags:
            raise ValueError("TIFF IFD lacks image dimensions")
        # sub-tier decodability from the tags already walked: mirror
        # decode_tiff's envelope (8-bit, chunky planar, strip-organized,
        # none/LZW/Deflate/PackBits, predictor ≤2) so the router's
        # verdict matches what decode will actually accept
        sub_ok = (
            tags.get(258, 8) in (8, 16)
            and not (tags.get(258, 8) == 16 and tags.get(317, 1) == 2)
            and tags.get(284, 1) == 1
            and 322 not in tags and 323 not in tags
            and tags.get(259, 1) in (1, 5, 8, 32946, 32773)
            and tags.get(262, 1) in (0, 1, 2)
            and tags.get(317, 1) in (1, 2)
        )
        return {"format": "tiff", "width": int(tags[256]), "height": int(tags[257]),
                "bit_depth": int(tags.get(258, 1)),
                "n_channels": int(tags.get(277, 1)),
                "progressive": False, "sub_decodable": sub_ok}
    if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 22:  # ICO
        (n_images,) = struct.unpack_from("<H", payload, 4)
        if n_images == 0:
            raise ValueError("ICO directory is empty")
        w, h = payload[6], payload[7]  # 0 encodes 256
        # sub-tier decodability: mirror _decode_ico's largest-entry pick
        # and its PNG-or-24/32-bit-DIB envelope
        best = None
        for i in range(n_images):
            at = 6 + 16 * i
            if at + 16 > len(payload):
                break
            ew, eh = payload[at] or 256, payload[at + 1] or 256
            size, off = struct.unpack_from("<II", payload, at + 8)
            if best is None or ew * eh > best[0] * best[1]:
                best = (ew, eh, size, off)
        sub_ok = False
        if best is not None and best[3] + best[2] <= len(payload):
            img = payload[best[3] : best[3] + best[2]]
            if img[:8] == PNG_MAGIC:
                sub_ok = True
            elif len(img) >= 40:
                (bpp,) = struct.unpack_from("<H", img, 14)
                (comp,) = struct.unpack_from("<I", img, 16)
                sub_ok = comp == 0 and bpp in (8, 24, 32)
        return {"format": "ico", "width": w or 256, "height": h or 256,
                "bit_depth": payload[12] or 8, "n_channels": 4,
                "progressive": False, "sub_decodable": sub_ok}
    raise ValueError("unrecognized image container")


IMAGE_META_SCHEMA = (
    "doc_id long, format string, width int, height int, "
    "bit_depth int, n_channels int, progressive boolean"
)


def probe_image_meta(df: DataFrame) -> DataFrame:
    """Corpus-wide image triage (r11 — completing the image/audio/video
    trio): one header-only metadata row per payload via
    :func:`parse_image_meta`. Covers MORE formats than decode_rgb (WebP
    sizes-and-routes here even though no VP8 decoder exists in this
    container; GIF graduated to the decodable tier in r12).
    Torn/unrecognized payloads emit ``width = -1``.
    Map-only, Arrow-batched, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "format", "width", "height",
            "bit_depth", "n_channels", "progressive",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    m = parse_image_meta(bytes(payload))
                    for k in cols[1:]:
                        out[k].append(m[k])
                except Exception:
                    out["format"].append(None)
                    out["width"].append(-1)
                    out["height"].append(0)
                    out["bit_depth"].append(0)
                    out["n_channels"].append(0)
                    out["progressive"].append(None)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=IMAGE_META_SCHEMA)


# --- unified media router (r11): one scan, all modalities -------------------

MEDIA_META_SCHEMA = (
    "doc_id long, modality string, format string, width int, height int, "
    "duration_s double, sample_rate int, channels int, bit_depth int, "
    "decodable boolean"
)

# formats functions in THIS container can fully decode (decode_rgb /
# decode_wav); everything else routes to an external decoder downstream.
# The verdict is FORMAT-level (the jpeg-arithmetic precedent: rare
# sub-tiers may still raise and degrade to skip rows), EXCEPT where the
# triage already extracts enough to refine it: TIFF (bit depth / layout
# / compression tags → decode_tiff's exact envelope) and ICO (the
# largest entry's PNG-or-24/32-bit-DIB check) carry a per-payload
# ``sub_decodable`` hint that parse_media_meta folds in.
_DECODABLE_IMAGE = {"ppm", "bmp", "png", "jpeg", "gif", "webp_lossless", "tiff", "ico"}
# r12: native FLAC decode (functions/flac.py); r14: MP3 Layer III
# (functions/mp3.py — per-payload failures on that module's documented
# boundaries follow the skip-row contract, like arithmetic JPEG)
_DECODABLE_AUDIO = {"pcm", "flac"}
_DECODABLE_AUDIO_PREFIXES = ("mp3/MPEG",)


def _audio_decodable(codec: str) -> bool:
    if codec in _DECODABLE_AUDIO:
        return True
    return codec.startswith(_DECODABLE_AUDIO_PREFIXES) and codec.endswith("-L3")


def parse_media_meta(payload: bytes) -> dict:
    """ONE dispatch across all three modalities: image containers
    (:func:`parse_image_meta`), audio containers
    (:func:`parse_audio_meta`), and ISO-BMFF video
    (:func:`parse_mp4_meta`, tried after audio so M4A — BMFF with only
    a ``soun`` track — lands as audio) — normalized onto one router
    row: modality, format, dimensions, duration, sample rate, channels,
    bit depth, and whether THIS container can fully decode it
    (decode_rgb / decode_wav) or it must route to an external decoder.
    Raises ValueError when no parser claims the payload."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # ISO-BMFF resolves by its TRACKS, not by magic alone: a vide
        # track makes it video even when audio rides along; soun-only
        # is M4A-style audio
        m = parse_mp4_meta(payload)
        if m["video_codec"] is not None:
            return {
                "modality": "video",
                "format": m["video_codec"],
                "width": m["width"], "height": m["height"],
                "duration_s": m["duration_s"], "sample_rate": 0,
                "channels": 0, "bit_depth": 0,
                "decodable": False,  # video decode is the documented boundary
            }
        if m["audio_codec"] is not None:
            return {
                "modality": "audio", "format": m["audio_codec"],
                "width": 0, "height": 0,
                # mdhd media timescale = the audio clock; never the mvhd
                # movie timescale (presentation clock). 0 = unknown.
                "duration_s": m["duration_s"], "sample_rate": m["audio_timescale"],
                "channels": 0, "bit_depth": 0, "decodable": False,
            }
        raise ValueError("ISO-BMFF payload has no audio or video track")
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # r13: RIFF/AVI joins the video branch, and MJPEG streams are
        # the first video tier this container genuinely DECODES (every
        # frame chunk is a complete JPEG — functions/video.py); other
        # fourccs (h264/xvid/...) triage-and-route like ISO-BMFF video
        from http_feeds_spark.functions.video import parse_avi_meta

        m = parse_avi_meta(payload)
        return {
            "modality": "video", "format": m["fourcc"] or "avi",
            "width": m["width"], "height": m["height"],
            "duration_s": m["duration_s"], "sample_rate": 0,
            "channels": 0, "bit_depth": 0,
            "decodable": m["fourcc"] in ("mjpg", "jpeg"),
        }
    try:
        m = parse_image_meta(payload)
        return {
            "modality": "image", "format": m["format"],
            "width": m["width"], "height": m["height"],
            "duration_s": None, "sample_rate": 0,
            "channels": m["n_channels"], "bit_depth": m["bit_depth"],
            "decodable": m["format"] in _DECODABLE_IMAGE
            and m.get("sub_decodable", True),
        }
    except ValueError:
        pass
    m = parse_audio_meta(payload)  # raises for everything unrecognized
    return {
        "modality": "audio", "format": m["codec"],
        "width": 0, "height": 0,
        "duration_s": m["duration_s"], "sample_rate": m["sample_rate"],
        "channels": m["channels"], "bit_depth": m["bits_per_sample"],
        # format-level verdict refined by the per-payload probes where
        # triage extracts enough (TIFF/ICO on images; MP3 side info)
        "decodable": _audio_decodable(m["codec"]) and m.get("sub_decodable", True),
    }


def probe_media_meta(df: DataFrame) -> DataFrame:
    """The mixed-corpus ROUTER (r11 capstone of the triage trio): one
    Arrow-batched map-only pass over ``(doc_id, payload)`` answering,
    for EVERY payload at once — what is it, how big/long is it, and can
    this engine decode it locally — so a 100 TB mixed-media corpus
    partitions into per-modality pipelines with ONE metadata-only scan
    instead of three. Unclaimed payloads emit modality=NULL rows
    (skip-don't-crash); the per-modality probes remain for deep fields
    the unified schema drops (codec fourccs, VBR, progressive)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "modality", "format", "width", "height",
            "duration_s", "sample_rate", "channels", "bit_depth", "decodable",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    m = parse_media_meta(bytes(payload))
                    for k in cols[1:]:
                        out[k].append(m[k])
                except Exception:
                    out["modality"].append(None)
                    out["format"].append(None)
                    out["width"].append(-1)
                    out["height"].append(0)
                    out["duration_s"].append(None)
                    out["sample_rate"].append(-1)
                    out["channels"].append(0)
                    out["bit_depth"].append(0)
                    out["decodable"].append(False)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=MEDIA_META_SCHEMA)
