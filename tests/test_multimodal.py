

def _gradient_ppm(w=8, h=4):
    import numpy as np
    from palo_spark.operators.multimodal import encode_ppm

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 30  # R by column
    arr[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 60  # G by row
    arr[:, :, 2] = 200
    return arr, encode_ppm(arr)


def _tiny_bmp():
    """Hand-built 2x2 24-bit BMP (bottom-up): TL=red TR=green BL=blue BR=white."""
    import struct

    # pixel rows bottom-up, BGR, padded to 4 bytes: row0 = BL,BR; row1 = TL,TR
    row0 = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\0\0"
    row1 = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\0\0"
    px = row0 + row1
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px), 0, 0, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(px), 0, 0, 14 + 40)
    return header + info + px


def test_real_ppm_decode_roundtrip(spark):
    import numpy as np
    from palo_spark.operators.multimodal import decode_pixels

    arr, ppm = _gradient_ppm()
    assert np.array_equal(decode_pixels(ppm), arr)
    # with a comment in the header
    commented = ppm.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_pixels(commented), arr)


def test_real_bmp_decode(spark):
    from palo_spark.operators.multimodal import decode_pixels

    px = decode_pixels(_tiny_bmp())
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]    # TL red
    assert px[0, 1].tolist() == [0, 255, 0]    # TR green
    assert px[1, 0].tolist() == [0, 0, 255]    # BL blue
    assert px[1, 1].tolist() == [255, 255, 255]


def test_real_image_through_spark_pipeline(spark):
    """decode_media / resize_media / extract_features run REAL pixel
    work for PPM/BMP payloads through the same mapInPandas plumbing."""
    import numpy as np
    from palo_spark.operators.multimodal import (
        decode_media,
        decode_pixels,
        extract_features,
        resize_media,
    )

    arr, ppm = _gradient_ppm(8, 4)
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(_tiny_bmp()))],
        "media_id long, payload binary",
    )
    meta = {r["media_id"]: r for r in decode_media(df).collect()}
    assert meta[1]["width"] == 8 and meta[1]["height"] == 4
    assert meta[1]["mime"] == "image/x-portable-pixmap"
    assert meta[2]["width"] == 2 and meta[2]["mime"] == "image/bmp"

    resized = {r["media_id"]: bytes(r["payload"]) for r in resize_media(df, 4, 2).collect()}
    px = decode_pixels(resized[1])
    assert px.shape == (2, 4, 3)
    # nearest-neighbor: row 0 of output = row 0 of input, cols 0,2,4,6
    assert np.array_equal(px[0], arr[0, [0, 2, 4, 6]])

    feats = {r["media_id"]: r["features"] for r in extract_features(df).collect()}
    v = feats[2]
    # 2x2 BMP: means = (R+G+B+W)/4 per channel = (255+0+0+255)/4/255 = 0.5
    assert abs(v[0] - 0.5) < 1e-6 and abs(v[1] - 0.5) < 1e-6 and abs(v[2] - 0.5) < 1e-6
    # histogram: 4 distinct corner cells, 1/4 each, in bins 100b=4,010b=2,001b=1,111b=7
    hist = v[3:11]
    assert hist[4] == 0.25 and hist[2] == 0.25 and hist[1] == 0.25 and hist[7] == 0.25


def test_wav_codec_roundtrip_and_stereo_guard():
    import numpy as np

    from palo_spark.operators import decode_wav, encode_wav

    pcm = np.array([0, 300, -300, 32767, -32768, 7], dtype=np.int64)
    rate, out = decode_wav(encode_wav(pcm, 8000))
    assert rate == 8000 and out.tolist() == pcm.tolist()
    # clipping
    _, clipped = decode_wav(encode_wav([40000, -40000], 8000))
    assert clipped.tolist() == [32767, -32768]
    # non-RIFF rejects cleanly
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        decode_wav(b"ID3\x03" + b"\x00" * 60)
