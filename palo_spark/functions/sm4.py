"""SM4 block cipher (GB/T 32907-2016) — closes the last crypto gap in
SURVEY §2.5's encryption family (``sm4_encrypt/sm4_decrypt``; Doris
evaluates these natively [upstream: be/src/util/encryption_util.cpp]).

No JVM/SQL engine here ships SM4, so like SM3 this is the rare family
evaluated in Python — as Arrow-batched pandas UDFs whose kernel is
fully numpy-vectorized across *all blocks of all rows in a batch*
(uint32 lanes, S-box via ``np.take``): no per-row Python in ECB mode.
Doris users call these on short identifiers/PII fields, not documents;
keep them off 100 TB hot paths regardless.

Modes: SM4_128_ECB (default, vectorized) and SM4_128_CBC (per-row block
chaining — serial across a row's blocks by definition, still batched
across rows). PKCS#7 padding, mirroring Doris/MySQL block-cipher
behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_SBOX = np.array([
    0xD6, 0x90, 0xE9, 0xFE, 0xCC, 0xE1, 0x3D, 0xB7, 0x16, 0xB6, 0x14, 0xC2,
    0x28, 0xFB, 0x2C, 0x05, 0x2B, 0x67, 0x9A, 0x76, 0x2A, 0xBE, 0x04, 0xC3,
    0xAA, 0x44, 0x13, 0x26, 0x49, 0x86, 0x06, 0x99, 0x9C, 0x42, 0x50, 0xF4,
    0x91, 0xEF, 0x98, 0x7A, 0x33, 0x54, 0x0B, 0x43, 0xED, 0xCF, 0xAC, 0x62,
    0xE4, 0xB3, 0x1C, 0xA9, 0xC9, 0x08, 0xE8, 0x95, 0x80, 0xDF, 0x94, 0xFA,
    0x75, 0x8F, 0x3F, 0xA6, 0x47, 0x07, 0xA7, 0xFC, 0xF3, 0x73, 0x17, 0xBA,
    0x83, 0x59, 0x3C, 0x19, 0xE6, 0x85, 0x4F, 0xA8, 0x68, 0x6B, 0x81, 0xB2,
    0x71, 0x64, 0xDA, 0x8B, 0xF8, 0xEB, 0x0F, 0x4B, 0x70, 0x56, 0x9D, 0x35,
    0x1E, 0x24, 0x0E, 0x5E, 0x63, 0x58, 0xD1, 0xA2, 0x25, 0x22, 0x7C, 0x3B,
    0x01, 0x21, 0x78, 0x87, 0xD4, 0x00, 0x46, 0x57, 0x9F, 0xD3, 0x27, 0x52,
    0x4C, 0x36, 0x02, 0xE7, 0xA0, 0xC4, 0xC8, 0x9E, 0xEA, 0xBF, 0x8A, 0xD2,
    0x40, 0xC7, 0x38, 0xB5, 0xA3, 0xF7, 0xF2, 0xCE, 0xF9, 0x61, 0x15, 0xA1,
    0xE0, 0xAE, 0x5D, 0xA4, 0x9B, 0x34, 0x1A, 0x55, 0xAD, 0x93, 0x32, 0x30,
    0xF5, 0x8C, 0xB1, 0xE3, 0x1D, 0xF6, 0xE2, 0x2E, 0x82, 0x66, 0xCA, 0x60,
    0xC0, 0x29, 0x23, 0xAB, 0x0D, 0x53, 0x4E, 0x6F, 0xD5, 0xDB, 0x37, 0x45,
    0xDE, 0xFD, 0x8E, 0x2F, 0x03, 0xFF, 0x6A, 0x72, 0x6D, 0x6C, 0x5B, 0x51,
    0x8D, 0x1B, 0xAF, 0x92, 0xBB, 0xDD, 0xBC, 0x7F, 0x11, 0xD9, 0x5C, 0x41,
    0x1F, 0x10, 0x5A, 0xD8, 0x0A, 0xC1, 0x31, 0x88, 0xA5, 0xCD, 0x7B, 0xBD,
    0x2D, 0x74, 0xD0, 0x12, 0xB8, 0xE5, 0xB4, 0xB0, 0x89, 0x69, 0x97, 0x4A,
    0x0C, 0x96, 0x77, 0x7E, 0x65, 0xB9, 0xF1, 0x09, 0xC5, 0x6E, 0xC6, 0x84,
    0x18, 0xF0, 0x7D, 0xEC, 0x3A, 0xDC, 0x4D, 0x20, 0x79, 0xEE, 0x5F, 0x3E,
    0xD7, 0xCB, 0x39, 0x48,
], dtype=np.uint8)

_FK = np.array([0xA3B1BAC6, 0x56AA3350, 0x677D9197, 0xB27022DC], dtype=np.uint64)
_CK = np.array(
    [
        sum(((4 * i + j) * 7 % 256) << (24 - 8 * j) for j in range(4))
        for i in range(32)
    ],
    dtype=np.uint64,
)

_M32 = np.uint64(0xFFFFFFFF)


def _rotl(x, n):
    n = np.uint64(n)
    return ((x << n) | (x >> (np.uint64(32) - n))) & _M32


def _tau(x):
    """Per-byte S-box over a uint64-held 32-bit lane array (vectorized)."""
    out = np.zeros_like(x)
    for shift in (24, 16, 8, 0):
        b = (x >> np.uint64(shift)) & np.uint64(0xFF)
        out |= _SBOX[b.astype(np.intp)].astype(np.uint64) << np.uint64(shift)
    return out


def _t_enc(x):
    b = _tau(x)
    return b ^ _rotl(b, 2) ^ _rotl(b, 10) ^ _rotl(b, 18) ^ _rotl(b, 24)


def _t_key(x):
    b = _tau(x)
    return b ^ _rotl(b, 13) ^ _rotl(b, 23)


def sm4_key_schedule(key: bytes) -> np.ndarray:
    """32 round keys from a 16-byte key (GB/T 32907 §6.3)."""
    if len(key) != 16:
        raise ValueError("SM4 requires a 16-byte key")
    mk = np.frombuffer(key, dtype=">u4").astype(np.uint64)
    k = list(mk ^ _FK)
    rks = []
    for i in range(32):
        nk = k[0] ^ _t_key(k[1] ^ k[2] ^ k[3] ^ _CK[i])
        rks.append(nk)
        k = [k[1], k[2], k[3], nk]
    return np.array(rks, dtype=np.uint64)


def _crypt_blocks(blocks: np.ndarray, rks: np.ndarray) -> np.ndarray:
    """Run the 32-round SM4 transform over an (n, 4) uint64 lane matrix
    (each row one 128-bit block) — vectorized across all n blocks."""
    x0, x1, x2, x3 = blocks[:, 0], blocks[:, 1], blocks[:, 2], blocks[:, 3]
    for i in range(32):
        nx = x0 ^ _t_enc(x1 ^ x2 ^ x3 ^ rks[i])
        x0, x1, x2, x3 = x1, x2, x3, nx
    return np.stack([x3, x2, x1, x0], axis=1)


def _to_lanes(raw: bytes) -> np.ndarray:
    return np.frombuffer(raw, dtype=">u4").astype(np.uint64).reshape(-1, 4)


def _from_lanes(lanes: np.ndarray) -> bytes:
    return lanes.astype(">u4").tobytes()


def sm4_encrypt_raw(data: bytes, key: bytes, iv: bytes | None = None,
                    mode: str = "SM4_128_ECB") -> bytes:
    """PKCS#7-pad and encrypt one payload (reference scalar path; the
    UDF batches all rows' blocks through one _crypt_blocks call in ECB)."""
    rks = sm4_key_schedule(key)
    pad = 16 - len(data) % 16
    padded = data + bytes([pad]) * pad
    if mode.upper().endswith("ECB"):
        return _from_lanes(_crypt_blocks(_to_lanes(padded), rks))
    if mode.upper().endswith("CBC"):
        if iv is None or len(iv) != 16:
            raise ValueError("CBC needs a 16-byte iv")
        prev = _to_lanes(iv)[0]
        out = []
        for blk in _to_lanes(padded):
            enc = _crypt_blocks((blk ^ prev)[None, :], rks)[0]
            out.append(enc)
            prev = enc
        return _from_lanes(np.stack(out))
    raise ValueError(f"unsupported SM4 mode: {mode}")


def sm4_decrypt_raw(data: bytes, key: bytes, iv: bytes | None = None,
                    mode: str = "SM4_128_ECB") -> bytes:
    rks = sm4_key_schedule(key)[::-1].copy()
    if len(data) % 16 != 0 or not data:
        raise ValueError("ciphertext not block-aligned")
    lanes = _to_lanes(data)
    if mode.upper().endswith("ECB"):
        plain = _from_lanes(_crypt_blocks(lanes, rks))
    elif mode.upper().endswith("CBC"):
        if iv is None or len(iv) != 16:
            raise ValueError("CBC needs a 16-byte iv")
        dec = _crypt_blocks(lanes, rks)
        prevs = np.vstack([_to_lanes(iv), lanes[:-1]])
        plain = _from_lanes(dec ^ prevs)
    else:
        raise ValueError(f"unsupported SM4 mode: {mode}")
    pad = plain[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad PKCS#7 padding")
    return plain[:-pad]


def _batch_ecb(series: pd.Series, key: bytes, encrypt: bool) -> pd.Series:
    """ECB over a whole Arrow batch: concatenate every row's blocks into
    one lane matrix, one vectorized 32-round pass, then split back."""
    rks = sm4_key_schedule(key)
    if not encrypt:
        rks = rks[::-1].copy()
    payloads, counts = [], []
    for v in series:
        if v is None:
            counts.append(-1)
            continue
        raw = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        if encrypt:
            pad = 16 - len(raw) % 16
            raw = bytes(raw) + bytes([pad]) * pad
        elif len(raw) % 16 != 0 or not raw:
            counts.append(-1)
            continue
        payloads.append(bytes(raw))
        counts.append(len(raw) // 16)
    if payloads:
        lanes = _to_lanes(b"".join(payloads))
        out_bytes = _from_lanes(_crypt_blocks(lanes, rks))
    else:
        out_bytes = b""
    res, off = [], 0
    for n in counts:
        if n < 0:
            res.append(None)
            continue
        chunk = out_bytes[off : off + 16 * n]
        off += 16 * n
        if not encrypt:
            pad = chunk[-1]
            chunk = chunk[:-pad] if 1 <= pad <= 16 else None
        res.append(chunk)
    return pd.Series(res, dtype=object)


def _batch_cbc(series: pd.Series, key: bytes, iv: bytes, encrypt: bool) -> pd.Series:
    """CBC over a whole Arrow batch: chaining is serial *within* a row
    but rows are independent, so the kernel walks block index b and runs
    one vectorized 32-round pass over every row that has a b-th block —
    max(blocks) passes total, each across the full batch width."""
    rks = sm4_key_schedule(key)
    if not encrypt:
        rks = rks[::-1].copy()
    iv_lanes = _to_lanes(iv)[0]
    rows: list[np.ndarray | None] = []
    for v in series:
        if v is None:
            rows.append(None)
            continue
        raw = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        if encrypt:
            pad = 16 - len(raw) % 16
            raw = bytes(raw) + bytes([pad]) * pad
        elif len(raw) % 16 != 0 or not raw:
            rows.append(None)
            continue
        rows.append(_to_lanes(bytes(raw)))
    live = [i for i, r in enumerate(rows) if r is not None]
    if not live:
        return pd.Series([None] * len(rows), dtype=object)
    nblocks = np.array([rows[i].shape[0] for i in live])
    max_b = int(nblocks.max())
    n = len(live)
    lanes = np.zeros((n, max_b, 4), dtype=np.uint64)
    for j, i in enumerate(live):
        lanes[j, : nblocks[j]] = rows[i]
    out = np.zeros_like(lanes)
    prev = np.tile(iv_lanes, (n, 1))
    for b in range(max_b):
        m = nblocks > b
        if encrypt:
            enc = _crypt_blocks(lanes[m, b] ^ prev[m], rks)
            out[m, b] = enc
            prev[m] = enc
        else:
            dec = _crypt_blocks(lanes[m, b], rks)
            out[m, b] = dec ^ prev[m]
            prev[m] = lanes[m, b]
    res: list[bytes | None] = [None] * len(rows)
    for j, i in enumerate(live):
        chunk = _from_lanes(out[j, : nblocks[j]])
        if not encrypt:
            pad = chunk[-1]
            chunk = chunk[:-pad] if 1 <= pad <= 16 else None
        res[i] = chunk
    return pd.Series(res, dtype=object)


def _key_bytes(key) -> bytes:
    k = key.encode("utf-8") if isinstance(key, str) else bytes(key)
    if len(k) != 16:
        raise ValueError("SM4 requires a 16-byte key")
    return k


def sm4_encrypt(data, key, iv=None, mode: str = "SM4_128_ECB") -> Column:
    """Doris ``SM4_ENCRYPT(data, key[, iv, mode])`` → binary ciphertext.

    Key/iv/mode are Python literals (the overwhelmingly common Doris
    call shape — constant key per query); data is the column.
    """
    k = _key_bytes(key)
    c = data if isinstance(data, Column) else F.col(data)
    if mode.upper().endswith("ECB"):

        @F.pandas_udf("binary")
        def _f(s: pd.Series) -> pd.Series:
            return _batch_ecb(s, k, encrypt=True)

        return _f(c.cast("string"))

    ivb = bytes(iv.encode("utf-8") if isinstance(iv, str) else iv)
    if len(ivb) != 16:
        raise ValueError("CBC needs a 16-byte iv")

    @F.pandas_udf("binary")
    def _g(s: pd.Series) -> pd.Series:
        return _batch_cbc(s, k, ivb, encrypt=True)

    return _g(c.cast("string"))


def sm4_decrypt(data, key, iv=None, mode: str = "SM4_128_ECB") -> Column:
    """Doris ``SM4_DECRYPT(cipher, key[, iv, mode])`` → string plaintext
    (NULL on malformed ciphertext/padding, matching MySQL behavior)."""
    k = _key_bytes(key)
    c = data if isinstance(data, Column) else F.col(data)
    if mode.upper().endswith("ECB"):

        @F.pandas_udf("binary")
        def _f(s: pd.Series) -> pd.Series:
            return _batch_ecb(s, k, encrypt=False)

        return _f(c).cast("string")

    ivb = bytes(iv.encode("utf-8") if isinstance(iv, str) else iv)
    if len(ivb) != 16:
        raise ValueError("CBC needs a 16-byte iv")

    @F.pandas_udf("binary")
    def _g(s: pd.Series) -> pd.Series:
        return _batch_cbc(s, k, ivb, encrypt=False)

    return _g(c).cast("string")
