"""Property-based tests (hypothesis) for the pure-Python kernels —
the pieces whose correctness is NOT covered by the DuckDB oracle
(engine-internal codecs and ciphers)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from palo_spark.functions.sm4 import sm4_decrypt_raw, sm4_encrypt_raw
from palo_spark.operators.multimodal import (
    decode_pixels,
    encode_ppm,
    resize_nearest,
)


@settings(max_examples=50, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
    key=st.binary(min_size=16, max_size=16),
)
def test_sm4_ecb_roundtrip_property(data, key):
    assert sm4_decrypt_raw(sm4_encrypt_raw(data, key), key) == data


@settings(max_examples=50, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
    key=st.binary(min_size=16, max_size=16),
    iv=st.binary(min_size=16, max_size=16),
)
def test_sm4_cbc_roundtrip_property(data, key, iv):
    ct = sm4_encrypt_raw(data, key, iv, "SM4_128_CBC")
    assert sm4_decrypt_raw(ct, key, iv, "SM4_128_CBC") == data
    # ciphertext differs from ECB unless degenerate zero-iv chaining
    if data and iv != b"\x00" * 16:
        assert ct != sm4_encrypt_raw(data, key)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_pixels(encode_ppm(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    tw=st.integers(min_value=1, max_value=16),
    th=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_resize_nearest_properties(w, h, tw, th, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    # every output pixel exists in the input (nearest picks, never blends)
    assert set(map(tuple, out.reshape(-1, 3))) <= set(map(tuple, arr.reshape(-1, 3)))
    # identity resize is exact
    assert np.array_equal(resize_nearest(arr, w, h), arr)


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=64),
    key=st.binary(min_size=16, max_size=16),
)
def test_sm4_encrypt_deterministic_and_block_aligned(data, key):
    c1 = sm4_encrypt_raw(data, key)
    c2 = sm4_encrypt_raw(data, key)
    assert c1 == c2
    assert len(c1) % 16 == 0 and len(c1) == (len(data) // 16 + 1) * 16


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_style_flip_consistency(w, h, seed):
    """Encoding the decode of any image is idempotent (PPM fixpoint)."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    once = encode_ppm(decode_pixels(encode_ppm(arr)))
    assert once == encode_ppm(arr)


# --- statement splitter properties (r8: comment/escape hardening) ----------

_FRAGMENTS = st.lists(
    st.sampled_from(
        [
            "SELECT 1 AS a",
            "SELECT 'a;b' AS s",
            'SELECT "x;y" AS s2',
            "SELECT `c;d` FROM t",
            r"SELECT 'it\'s' AS e",
            "SELECT 'it''s' AS e2",
            "SELECT (1; 2)".replace(";", ","),  # parens with commas
            "SELECT f(1, 2) AS g",
            "SELECT 1 -- note; with semi",
            "SELECT 1 # hash; note",
            "SELECT /* block; comment */ 2",
            "INSERT INTO t VALUES (1, ';')",
        ]
    ),
    min_size=1,
    max_size=6,
)


@given(_FRAGMENTS)
@settings(max_examples=200, deadline=None)
def test_split_statements_roundtrip_property(stmts):
    """Joining N statements with ';' and splitting recovers exactly N
    statements whose comment-stripped text matches the originals —
    i.e. no ';' inside quotes/comments ever splits, and every real
    top-level ';' always does. Line comments force a newline before the
    joiner (as any real script has), since text after '--' on the same
    line IS comment by SQL rules."""
    from palo_spark.palo_session import PaloSession

    joined = ""
    for s in stmts:
        joined += s + ("\n" if ("--" in s or "#" in s) else "") + ";"
    got = PaloSession._split_statements(joined)
    assert len(got) == len(stmts)
    for g, s in zip(got, stmts):
        assert PaloSession._strip_comments(g).strip() == (
            PaloSession._strip_comments(s).strip()
        )
