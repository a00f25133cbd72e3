"""Vendored baseline-JPEG codec tests (r4 verdict, "Next round" #6): the
compressed-image branch of `decode_image_real` must execute green
in-container, with no Pillow installed.

Validation strategy (no external codec exists here to compare against):
1. encode→decode ROUND TRIP with the minimal in-repo encoder — verifies
   the DCT/quantization/Huffman math numerically (near-lossless at
   q=92 on smooth data, exact on constant blocks);
2. a REAL-WORLD fixture: the 16×16 4:2:0 color JFIF from CPython's own
   test suite (`Lib/test/test_email/data/python.jpg`, PSF-licensed
   public content), exercising multi-component decode, chroma
   upsampling, and YCbCr→RGB on bytes produced by a real encoder;
3. the Spark plumbing: the same kernel inside `extract_media_features`'
   mapInPandas batch over a payload column.
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from autoaudit_spark.llm.jpegdec import decode_jpeg, encode_jpeg_gray
from autoaudit_spark.llm.multimodal import decode_image_real

# CPython test-suite JPEG (public, PSF license): baseline SOF0, 16×16,
# 3 components, 4:2:0 luma/chroma sampling — a real encoder's output.
PYTHON_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)


class TestJpegCodec:
    def test_roundtrip_smooth_gradient_near_lossless(self):
        x = np.linspace(0, 255, 40)
        img = (np.add.outer(np.linspace(0, 200, 33), x) / 2).astype(np.uint8)
        dec, w, h = decode_jpeg(encode_jpeg_gray(img, quality=92))
        assert (w, h) == (40, 33)  # non-multiple-of-8 dims crop correctly
        assert dec.shape == (33, 40, 1)
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 2

    def test_roundtrip_constant_block_exact(self):
        img = np.full((16, 24), 77, np.uint8)
        dec, _, _ = decode_jpeg(encode_jpeg_gray(img, quality=90))
        assert np.array_equal(np.unique(dec), [77])

    def test_roundtrip_random_noise_bounded(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (24, 24), dtype=np.uint8).astype(np.uint8)
        dec, _, _ = decode_jpeg(encode_jpeg_gray(img, quality=95))
        # noise is the worst case for DCT coding; bound is loose but real
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
        assert err.mean() < 16

    def test_real_world_color_420_fixture(self):
        img, w, h = decode_jpeg(PYTHON_JPG)
        assert (w, h) == (16, 16)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        # genuine image content, not a degenerate plane
        assert img.std() > 10

    def test_decode_image_real_routes_jpeg(self):
        assert decode_image_real(PYTHON_JPG) == (16, 16, "jpeg")

    def test_progressive_rejected_clearly(self):
        # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must raise the
        # clear NotImplementedError through decode_image_real
        i = PYTHON_JPG.index(b"\xff\xc0")
        prog = PYTHON_JPG[:i] + b"\xff\xc2" + PYTHON_JPG[i + 2 :]
        with pytest.raises(ValueError, match="progressive"):
            decode_jpeg(prog)
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_image_real(prog)

    def test_malformed_streams_normalize_to_clear_raise(self):
        """ADVICE r5: decoder internals can raise KeyError/IndexError/
        StopIteration on corrupt streams — decode_image_real must
        normalize every malformed-JPEG failure to its clear
        NotImplementedError, never leak a raw executor exception."""
        malformed = [
            b"\xff\xd8",  # bare SOI → ValueError path
            b"\xff\xd8\xff\xc0\x00\x11\x08",  # truncated SOF → IndexError
            b"\xff\xd8" + bytes(range(50)),  # garbage marker stream
            PYTHON_JPG[: len(PYTHON_JPG) // 2],  # truncated mid-scan
        ]
        for p in malformed:
            with pytest.raises(NotImplementedError):
                decode_image_real(p)

    def test_spark_media_plumbing_decodes_jpeg(self, spark):
        from autoaudit_spark.llm.multimodal import extract_media_features

        mm = spark.createDataFrame(
            [(1, bytearray(PYTHON_JPG)), (2, bytearray(PYTHON_JPG))],
            "doc_id long, payload binary",
        )
        rows = (
            extract_media_features(mm, batch_decode=decode_image_real)
            .orderBy("doc_id")
            .collect()
        )
        assert [(r["width"], r["height"], r["format"]) for r in rows] == [
            (16, 16, "jpeg"),
            (16, 16, "jpeg"),
        ]
        assert all(r["payload_bytes"] == len(PYTHON_JPG) for r in rows)


class TestJpegProperties:
    def test_roundtrip_property_smooth_images(self):
        """Hypothesis sweep: arbitrary dims (incl. non-multiples of 8)
        and qualities round-trip smooth gradients near-losslessly —
        pins the DCT/quantization/Huffman algebra across block-edge
        geometries, not just the fixed fixtures above."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=41),
            w=st.integers(min_value=1, max_value=41),
            q=st.integers(min_value=85, max_value=98),
            sx=st.floats(min_value=-3.0, max_value=3.0),
            sy=st.floats(min_value=-3.0, max_value=3.0),
            off=st.integers(min_value=0, max_value=255),
        )
        def check(h, w, q, sx, sy, off):
            ramp = np.add.outer(np.arange(h) * sy, np.arange(w) * sx) + off
            img = np.clip(ramp, 0, 255).astype(np.uint8)
            dec, dw, dh = decode_jpeg(encode_jpeg_gray(img, quality=q))
            assert (dw, dh) == (w, h)
            err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
            assert err.max() <= 4, (h, w, q, sx, sy, off, err.max())

        check()
