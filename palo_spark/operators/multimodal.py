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


def parse_fake_header(payload: bytes) -> dict[str, Any]:
    """Parse the fake-codec header (pandas-UDF side, pure python)."""
    if payload is None or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; only the PSMM fake codec is implemented"
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
                meta = parse_fake_header(bytes(payload))
                body = bytes(payload)[-meta["body_len"]:] if meta["body_len"] else b""
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
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = blake2b(bytes(payload), digest_size=2 * dim).digest()
                vec = [
                    (int.from_bytes(h[2 * i : 2 * i + 2], "little") / 32767.5) - 1.0
                    for i in range(dim)
                ]
                rows.append((mid, vec))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return df.select("media_id", "payload").mapInPandas(
        _feat, "media_id long, features array<float>"
    )
