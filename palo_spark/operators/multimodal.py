"""Multimodal columns: opaque binary media + typed metadata.

Design (SURVEY.md §2.8 / driver brief): media (image/audio/video) lives
in a ``binary`` column next to a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The Spark-side plumbing — schema, batch iteration,
partition sizing — is real and tested; the *codec* itself is stubbed
(`Pillow`/`ffmpeg` are not in this container): ``decode_media`` parses a
deterministic fake header so tests exercise the full path end-to-end,
and raises ``NotImplementedError`` for real codecs.

Scale notes: binary payloads ride the normal columnar path (parquet
binary columns with page compression); ``mapInPandas`` streams Arrow
batches so peak memory is one batch of payloads per task — size
partitions so ``batch_rows × payload`` fits the executor (the
``spark.sql.execution.arrow.maxRecordsPerBatch`` knob, not driver
collects).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the typed metadata carried next to every media payload
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

_MAGIC = b"PSMM"  # palo_spark multimodal fake-codec magic


def media_schema(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    """Canonical multimodal row schema: id + binary payload + metadata."""
    return T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
        + (extra_fields or [])
    )


def fake_payload(mime: str, width: int, height: int, n_frames: int = 1, sample_rate: int = 0,
                 body: bytes = b"") -> bytes:
    """Deterministic fake media payload: magic + packed header + body.

    Stands in for real image/audio bytes so the decode path has
    something structured to parse.
    """
    mime_b = mime.encode()
    return (
        _MAGIC
        + struct.pack("<B", len(mime_b))
        + mime_b
        + struct.pack("<iiii", width, height, n_frames, sample_rate)
        + body
    )


def pack_media(df: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal DataFrame from a text fixture: each row's text
    becomes the payload body with a deterministic fake header derived
    from the id (native expressions — the parquet-side layout is what
    matters, not the codec)."""
    c_id = F.col(id_col)
    width = (c_id % 640 + 16).cast("int")
    height = (c_id % 480 + 16).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.lit(bytes([9])),  # len("image/png")
        F.lit(b"image/png"),
        # little-endian int32 packing via manual byte assembly
        _le32(width), _le32(height), _le32(F.lit(1)), _le32(F.lit(0)),
    )
    return df.select(
        c_id.alias("media_id"),
        F.concat(header, F.encode(F.col(text_col), "UTF-8")).alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            width.alias("width"),
            height.alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _le32(col) -> "F.Column":
    """4 little-endian bytes of an int column, as binary (hex→unhex)."""
    c = col.cast("long")

    def byte(i: int):
        return F.lpad(F.hex(F.shiftright(c, 8 * i).bitwiseAND(F.lit(255))), 2, "0")

    return F.unhex(F.concat(byte(0), byte(1), byte(2), byte(3)))


# ---------------------------------------------------------- real codecs
# PPM (P6) and 24-bit uncompressed BMP decode/encode in pure numpy — no
# imaging library needed, so these two formats are REAL end-to-end
# (pixels in, pixels out); compressed formats (JPEG/PNG/...) remain
# gated behind NotImplementedError until a codec library is present.


def decode_pixels(payload: bytes) -> "np.ndarray":
    """Decode a PPM(P6) or 24-bit BMP payload to an (h, w, 3) uint8 RGB
    array. Raises NotImplementedError for other formats."""
    import numpy as np

    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw
        tokens, i, ntok = [], 2, 0
        while ntok < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to end of line
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            ntok += 1
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = tokens
        if maxval != 255:
            raise NotImplementedError("only 8-bit PPM supported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        return arr.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise NotImplementedError("only 24-bit uncompressed BMP supported")
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR → RGB
        return (rgb[::-1] if flip else rgb).copy()
    raise NotImplementedError(
        "real decoding implemented for PPM(P6)/BMP24 only; other formats "
        "need codec libraries not present in this environment"
    )


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 → PPM P6 bytes."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize via pure numpy index maps."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def _is_real_image(payload: bytes) -> bool:
    return payload[:2] in (b"P6", b"BM")


def parse_fake_header(payload: bytes) -> dict[str, Any]:
    """Parse the fake-codec header (pandas-UDF side, pure python)."""
    if payload is not None and _is_real_image(bytes(payload)):
        px = decode_pixels(bytes(payload))
        mime = "image/x-portable-pixmap" if payload[:2] == b"P6" else "image/bmp"
        return {
            "mime": mime,
            "width": px.shape[1],
            "height": px.shape[0],
            "n_frames": 1,
            "sample_rate": 0,
            "body_len": int(px.size),
        }
    if payload is None or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; only PPM(P6)/BMP24 and the PSMM fake codec "
            "are implemented"
        )
    mlen = payload[4]
    mime = payload[5 : 5 + mlen].decode()
    off = 5 + mlen
    width, height, n_frames, sample_rate = struct.unpack_from("<iiii", payload, off)
    body = payload[off + 16 :]
    return {
        "mime": mime,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "body_len": len(body),
    }


_DECODE_SCHEMA = (
    "media_id long, mime string, width int, height int, n_frames int, "
    "sample_rate int, body_len int"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payload headers via ``mapInPandas`` (Arrow-batched).

    The real decode would produce pixel tensors / PCM frames here; the
    plumbing — batch iterator, schema contract, per-task memory bound —
    is exactly what a real codec UDF uses.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = parse_fake_header(bytes(payload))
                rows.append(
                    (
                        mid,
                        meta["mime"],
                        meta["width"],
                        meta["height"],
                        meta["n_frames"],
                        meta["sample_rate"],
                        meta["body_len"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime", "width", "height", "n_frames",
                    "sample_rate", "body_len",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(_decode, _DECODE_SCHEMA)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Metadata projection WITHOUT touching payloads — the fast path.

    Parquet column pruning means the (potentially huge) binary column is
    never read; at 100 TB this is the difference between a metadata scan
    and a full-corpus read.
    """
    return df.select("media_id", "meta.mime", "meta.width", "meta.height")


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: one row per kept frame index (video → frames).

    Pure lateral explode of ``sequence(0, n_frames-1, every_n)`` —
    native, shuffle-free; the per-frame decode would chain a
    ``mapInPandas`` like :func:`decode_media`.
    """
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def _build_payload(mime: str, width: int, height: int, n_frames: int,
                   sample_rate: int, body: bytes) -> bytes:
    m = mime.encode()
    return (
        _MAGIC + bytes([len(m)]) + m
        + struct.pack("<iiii", width, height, n_frames, sample_rate) + body
    )


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing (``mapInPandas``, Arrow-batched): rewrite each
    payload to the target dimensions. The real implementation would
    decode pixels and interpolate; the fake codec defines resize as
    "1 byte per pixel" — the body is truncated/zero-padded to
    ``width*height`` bytes — so the output payload size is a CHECKABLE
    function of the target dims (oracle-friendly) while the batch shape,
    schema contract, and per-task memory bound match a real resizer."""
    n_body = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if _is_real_image(b):
                    # REAL path: decode pixels, nearest-neighbor resample,
                    # re-encode as PPM — actual image resize, no libraries
                    px = resize_nearest(decode_pixels(b), width, height)
                    out.append((mid, encode_ppm(px)))
                    continue
                meta = parse_fake_header(b)
                body = b[-meta["body_len"]:] if meta["body_len"] else b""
                body = body[:n_body].ljust(n_body, b"\0")
                out.append(
                    (mid, _build_payload(meta["mime"], width, height,
                                         meta["n_frames"], meta["sample_rate"], body))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return df.select("media_id", "payload").mapInPandas(
        _resize, "media_id long, payload binary"
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing (CLIP-style embedding stand-in):
    one ``array<float>`` per payload via ``mapInPandas``. The vector is
    a DETERMINISTIC function of the payload bytes (blake2b-seeded,
    mapped into [-1, 1]) so tests can pin exact values; a real model
    would run batched inference in exactly this UDF shape (Arrow in,
    Arrow out, bounded batch memory)."""
    from hashlib import blake2b

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if _is_real_image(b):
                    # REAL path: per-channel means + 2×2×2 color histogram
                    # over actual pixels — a deterministic, content-based
                    # descriptor (the classical pre-CLIP baseline)
                    px = decode_pixels(b).astype(np.float64) / 255.0
                    means = px.mean(axis=(0, 1))
                    bits = (px >= 0.5).astype(np.int64)
                    cell = bits[:, :, 0] * 4 + bits[:, :, 1] * 2 + bits[:, :, 2]
                    hist = np.bincount(cell.ravel(), minlength=8) / cell.size
                    vec = list(means) + list(hist)
                    vec = (vec + [0.0] * dim)[:dim]
                    rows.append((mid, [float(v) for v in vec]))
                    continue
                h = blake2b(b, digest_size=2 * dim).digest()
                vec = [
                    (int.from_bytes(h[2 * i : 2 * i + 2], "little") / 32767.5) - 1.0
                    for i in range(dim)
                ]
                rows.append((mid, vec))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return df.select("media_id", "payload").mapInPandas(
        _feat, "media_id long, features array<float>"
    )


# --------------------------------------------------------------- WAV codec
# REAL audio codec, library-free: RIFF/WAVE PCM16 is a fixed-layout
# container — header assembly and sample extraction are pure numpy byte
# work, the same posture as the PPM/BMP image codec above. Compressed
# audio (MP3/AAC/OGG) stays behind NotImplementedError pending codec
# libraries; the Spark-side plumbing (binary column in, Arrow-batched
# decode, typed feature columns out) is identical for any codec.


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """PCM16 mono WAV bytes for an int sequence (values clipped to
    int16). Canonical 44-byte RIFF header + little-endian samples."""
    import struct

    pcm = np.asarray(samples, dtype=np.int64)
    pcm = np.clip(pcm, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """(sample_rate, int16 sample array) from PCM16 mono/stereo WAV
    bytes (stereo is averaged to mono). Raises NotImplementedError for
    non-PCM (compressed) WAV and other containers."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    # walk chunks: fmt then data (canonical files put them in order)
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise NotImplementedError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only PCM16 WAV supported (no codec libs)")
    pcm = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        pcm = pcm[: len(pcm) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
        pcm = pcm.astype(np.int64)
    return rate, np.asarray(pcm, dtype=np.int64)


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode WAV payloads and emit deterministic integer features —
    the audio half of corpus curation (silence/clipping filters, energy
    stats): sample_rate, n_samples, duration_ms, peak (max |x|),
    rms_milli (floor(sqrt(mean(x²))·1000) — exact: integer sums feed one
    correctly-rounded sqrt), zero_crossings. One Arrow-batched
    mapInPandas pass; schema is typed columns, NULLs for undecodable
    payloads (tolerate-don't-abort load posture)."""
    out_schema = (
        "media_id long, sample_rate int, n_samples long, duration_ms long, "
        "peak int, rms_milli long, zero_crossings long"
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                try:
                    rate, pcm = decode_wav(bytes(payload))
                except NotImplementedError:
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                n = int(len(pcm))
                if n == 0:
                    rows.append((mid, rate, 0, 0, 0, 0, 0))
                    continue
                peak = int(np.abs(pcm).max())
                # rms = floor(1000·sqrt(double(Σx²)/double(n))) — the
                # integer sum is exact (int64 safe to ~8.6e9 samples) and
                # the float chain mirrors SQL CAST/SQRT/FLOOR op-for-op,
                # so an oracle replays it bit-identically
                sq_sum = int(np.sum(pcm * pcm))
                rms_milli = math.floor(
                    math.sqrt(float(sq_sum) / float(n)) * 1000
                )
                zc = int((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).sum())
                rows.append(
                    (mid, rate, n, math.floor(n * 1000 / rate), peak, rms_milli, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_ms",
                    "peak", "rms_milli", "zero_crossings",
                ],
            )

    return df.select("media_id", payload_col).mapInPandas(_feat, out_schema)


# --------------------------------------------------------------------------
# REAL PNG codec (RFC 2083) — pure stdlib-zlib + numpy, no imaging library.


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a genuine PNG: IHDR (8-bit
    truecolor), one zlib IDAT of filter-0 scanlines, IEND — readable by
    any PNG decoder."""
    import struct
    import zlib as _z

    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    h, w, c = a.shape
    if c != 3:
        raise ValueError("encode_png: expected (h, w, 3) RGB")
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode an 8-bit RGB (color type 2) or grayscale (0) PNG to an
    (h, w, channels) uint8 array. Implements the full scanline unfilter
    set (None/Sub/Up/Average/Paeth); interlacing and palettes raise.
    Sub/Average/Paeth recurrences are sequential per byte by definition —
    the loop is bounded by row length and documented, not hidden."""
    import struct
    import zlib as _z

    if payload[:8] != _PNG_SIG:
        raise ValueError("decode_png: bad signature")
    pos, ihdr, idat = 8, None, b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("decode_png: missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or interlace:
        raise ValueError(
            f"decode_png: unsupported (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    ch = 3 if color == 2 else 1
    stride = w * ch
    raw = _z.decompress(idat)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorized
            rec = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth — per-byte recurrence
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                elif f == 4:
                    cc = prev[x - ch] if x >= ch else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"decode_png: bad filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, ch)
