"""Vendored PNG codec tests (r5 verdict, "Next round" #3): the PNG
branch of `decode_image_real` must execute green in-container with no
Pillow installed, like the JPEG branch before it (tests/test_jpeg.py).

Validation strategy:
1. encode→decode ROUND TRIP with the minimal in-repo encoder — PNG is
   lossless, so reconstruction must be EXACT;
2. per-filter reconstruction: forward-filter scanlines with each RFC
   2083 filter (Sub/Up/Average/Paeth) in the test, decode, assert exact
   pixels — pins the predictor math independently of the encoder;
3. a REAL-WORLD fixture: the 1×1 PNG every browser test suite ships,
   plus palette/tRNS/bit-depth crafted streams;
4. the Spark plumbing: the same kernel inside `extract_media_features`'
   mapInPandas batch over a payload column.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np
import pytest

from autoaudit_spark.llm.multimodal import decode_image_real
from autoaudit_spark.llm.pngdec import (
    _SIGNATURE,
    decode_png,
    encode_png_gray,
    encode_png_rgb,
)

ONE_BY_ONE = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42m"
    "P8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def chunk(ctype: bytes, data: bytes) -> bytes:
    body = ctype + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def make_png(w, h, depth, ctype, raw, extra=b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + extra
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


class TestPngCodec:
    def test_roundtrip_gray_exact(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
        dec, w, h = decode_png(encode_png_gray(img))
        assert (w, h) == (17, 13)
        assert np.array_equal(dec[:, :, 0], img)

    def test_roundtrip_rgb_exact(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
        dec, w, h = decode_png(encode_png_rgb(img))
        assert (w, h) == (5, 9)
        assert np.array_equal(dec, img)

    def test_each_filter_reconstructs_exactly(self):
        """Forward-filter an RGB image with one fixed filter per
        encoding (Sub/Up/Average/Paeth) and assert the decoder undoes
        it exactly."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
        h, w, ch = img.shape
        bpp = ch
        flat = img.reshape(h, w * ch).astype(np.int32)

        def paeth_pred(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        for ftype in (1, 2, 3, 4):
            raw = bytearray()
            for y in range(h):
                raw.append(ftype)
                prior = flat[y - 1] if y > 0 else np.zeros(w * ch, np.int32)
                for x in range(w * ch):
                    cur = int(flat[y][x])
                    left = int(flat[y][x - bpp]) if x >= bpp else 0
                    up = int(prior[x])
                    ul = int(prior[x - bpp]) if x >= bpp else 0
                    pred = {
                        1: left,
                        2: up,
                        3: (left + up) // 2,
                        4: paeth_pred(left, up, ul),
                    }[ftype]
                    raw.append((cur - pred) & 0xFF)
            dec, dw, dh = decode_png(make_png(w, h, 8, 2, bytes(raw)))
            assert (dw, dh) == (w, h)
            assert np.array_equal(dec, img), f"filter {ftype}"

    def test_palette_and_trns(self):
        pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
        # 3 wide, 2 high, depth 8 palette: row = filter byte + 3 indices
        raw = b"\x00\x00\x01\x02" + b"\x00\x02\x01\x00"
        png = make_png(3, 2, 8, 3, raw, extra=chunk(b"PLTE", pal))
        dec, w, h = decode_png(png)
        assert (w, h, dec.shape[2]) == (3, 2, 3)
        assert dec[0, 0].tolist() == [255, 0, 0]
        assert dec[1, 0].tolist() == [0, 0, 255]
        # with tRNS: first palette entry transparent → RGBA
        png_a = make_png(
            3, 2, 8, 3, raw,
            extra=chunk(b"PLTE", pal) + chunk(b"tRNS", b"\x00"),
        )
        dec_a, _, _ = decode_png(png_a)
        assert dec_a.shape[2] == 4
        assert dec_a[0, 0, 3] == 0 and dec_a[0, 1, 3] == 255

    def test_sub_byte_depths_scale_to_255(self):
        # 1-bit gray, 10 px wide: bits 1010101010 ... packed high-first
        w, h = 10, 2
        row = bytes([0b10101010, 0b10000000])
        raw = (b"\x00" + row) * h
        dec, dw, dh = decode_png(make_png(w, h, 1, 0, raw))
        assert (dw, dh) == (w, h)
        assert dec[0, :, 0].tolist() == [255, 0] * 5

    def test_16bit_takes_high_byte(self):
        w, h = 2, 1
        # big-endian 16-bit gray samples 0x1234, 0xFF00
        raw = b"\x00" + bytes([0x12, 0x34, 0xFF, 0x00])
        dec, _, _ = decode_png(make_png(w, h, 16, 0, raw))
        assert dec[0, :, 0].tolist() == [0x12, 0xFF]

    def test_real_world_1x1_fixture(self):
        dec, w, h = decode_png(ONE_BY_ONE)
        assert (w, h) == (1, 1)
        assert decode_image_real(ONE_BY_ONE) == (1, 1, "png")

    def test_interlaced_rejected_clearly(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
        png = (
            _SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(png)
        with pytest.raises(NotImplementedError, match="interlaced"):
            decode_image_real(png)

    def test_malformed_streams_normalize_to_clear_raise(self):
        malformed = [
            _SIGNATURE,  # no chunks
            _SIGNATURE + b"\x00" * 16,  # garbage chunk
            ONE_BY_ONE[: len(ONE_BY_ONE) - 20],  # truncated
            make_png(3, 2, 8, 3, b"\x00\x00\x01\x02\x00\x02\x01\x00"),  # no PLTE
            make_png(2, 2, 8, 0, b"\x00\xaa"),  # truncated pixel data
        ]
        for p in malformed:
            with pytest.raises(NotImplementedError):
                decode_image_real(p)

    def test_spark_media_plumbing_decodes_png(self, spark):
        from autoaudit_spark.llm.multimodal import extract_media_features

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
        payload = encode_png_rgb(img)
        mm = spark.createDataFrame(
            [(1, bytearray(payload)), (2, bytearray(ONE_BY_ONE))],
            "doc_id long, payload binary",
        )
        rows = (
            extract_media_features(mm, batch_decode=decode_image_real)
            .orderBy("doc_id")
            .collect()
        )
        assert [(r["width"], r["height"], r["format"]) for r in rows] == [
            (7, 4, "png"),
            (1, 1, "png"),
        ]


class TestPngProperties:
    def test_roundtrip_property_random_images(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=33),
            w=st.integers(min_value=1, max_value=33),
            rgb=st.booleans(),
            seed=st.integers(min_value=0, max_value=2**31),
        )
        def check(h, w, rgb, seed):
            rng = np.random.default_rng(seed)
            if rgb:
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                dec, dw, dh = decode_png(encode_png_rgb(img))
                assert np.array_equal(dec, img)
            else:
                img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                dec, dw, dh = decode_png(encode_png_gray(img))
                assert np.array_equal(dec[:, :, 0], img)
            assert (dw, dh) == (w, h)

        check()
