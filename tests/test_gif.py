"""Vendored GIF codec tests (r6 verdict, "Next round" #4): the GIF
branch of `decode_image_real` must execute green in-container with no
Pillow installed, completing the codec trio (tests/test_jpeg.py r5,
tests/test_png.py r6).

Validation strategy:
1. encode→decode ROUND TRIP with the in-repo encoder — GIF is lossless
   for ≤256-colour images, so reconstruction must be EXACT, including
   images large/noisy enough to drive the LZW table through the 4096
   reset and every code-width step;
2. a HAND-PACKED fixture: a 3×1 GIF whose LZW bitstream is written out
   by hand in the test, pinning the bit order and CLEAR/END handling
   independently of the encoder;
3. interlace: encode with the 4-pass row shuffle, assert the decoder
   inverts it exactly;
4. malformed streams normalize to the clear data-at-fault raise;
5. the Spark plumbing: the same kernel inside `extract_media_features`'
   mapInPandas batch over a payload column.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from autoaudit_spark.llm.gifdec import (
    _interlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from autoaudit_spark.llm.multimodal import decode_image_real


def noisy_rgb(h: int, w: int, n_colors: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return palette[idx]


class TestGifCodec:
    def test_roundtrip_small_exact(self):
        img = np.zeros((3, 5, 3), dtype=np.uint8)
        img[0, 0] = (255, 0, 0)
        img[1, 2] = (0, 255, 0)
        img[2, 4] = (0, 0, 255)
        dec, w, h = decode_gif(encode_gif(img))
        assert (w, h) == (5, 3)
        assert np.array_equal(dec, img)

    def test_roundtrip_noisy_drives_table_reset(self):
        """80×70 with 200 colours: ~5.6k pixels of near-random indices
        assign LZW codes past 4096, exercising the encoder's CLEAR-reset
        and the decoder's deferred-clear tolerance, plus every width
        step from mcs+1 up to 12."""
        img = noisy_rgb(70, 80, 200, seed=7)
        dec, w, h = decode_gif(encode_gif(img))
        assert (w, h) == (80, 70)
        assert np.array_equal(dec, img)

    def test_roundtrip_two_color_min_code_size_floor(self):
        """A 2-colour image uses the spec's mcs floor of 2 (§22) even
        though one bit would index the palette."""
        img = np.where(
            (np.add.outer(np.arange(6), np.arange(9)) % 2)[:, :, None] == 0,
            np.uint8(255),
            np.uint8(0),
        ) * np.ones(3, dtype=np.uint8)
        dec, w, h = decode_gif(encode_gif(img))
        assert np.array_equal(dec, img)

    def test_hand_packed_fixture_pins_bit_order(self):
        """3×1 single-colour-table GIF with the LZW stream packed BY
        HAND: mcs=2 → clear=4, end=5, width 3. Code sequence CLEAR(4),
        0, 1, 0, END(5), packed LSB-first per §22 appendix F — each
        code's low bit lands in the next free bit position:

            byte0: bits0-2 = 100b(4), bits3-5 = 000b(0), bits6-7 +
                   byte1 bit0 = 001b(1)          → byte0 = 0x44
            byte1: bits1-3 = 000b(0), bits4-6 = 101b(5) → byte1 = 0x50
        """
        header = b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x80, 0, 0)
        # global colour table, 2 entries: black, white
        gct = bytes([0, 0, 0, 255, 255, 255])
        desc = struct.pack("<BHHHHB", 0x2C, 0, 0, 3, 1, 0)
        lzw = bytes([2, 2, 0x44, 0x50, 0, 0x3B])  # mcs, blocksize, data…
        gif = header + gct + desc + lzw
        dec, w, h = decode_gif(gif)
        assert (w, h) == (3, 1)
        assert dec[0, 0].tolist() == [0, 0, 0]
        assert dec[0, 1].tolist() == [255, 255, 255]
        assert dec[0, 2].tolist() == [0, 0, 0]
        assert decode_image_real(gif) == (3, 1, "gif")

    def test_kwkwk_self_reference_case(self):
        """The code-equal-to-next-entry case (KwKwK): encode a run of
        identical pixels — the greedy encoder emits a code the decoder
        has not finished defining yet."""
        img = np.zeros((1, 9, 3), dtype=np.uint8)
        img[0, 0] = (1, 2, 3)  # two colours so the palette has 2 entries
        dec, w, h = decode_gif(encode_gif(img))
        assert np.array_equal(dec, img)

    def test_interlaced_roundtrip(self):
        img = noisy_rgb(17, 11, 31, seed=3)
        payload = encode_gif(img, interlace=True)
        dec, w, h = decode_gif(payload)
        assert (w, h) == (11, 17)
        assert np.array_equal(dec, img)

    def test_interlace_order_is_a_permutation(self):
        for h in (1, 2, 3, 7, 8, 16, 17):
            order = _interlace_order(h)
            assert sorted(order.tolist()) == list(range(h))

    def test_extensions_are_skipped(self):
        """A Graphic Control Extension and a comment block before the
        image descriptor must not disturb the decode."""
        base = encode_gif(np.full((2, 2, 3), 9, dtype=np.uint8))
        # splice extensions after header + screen descriptor + GCT(2)
        cut = 13 + 6
        gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        comment = bytes([0x21, 0xFE, 3]) + b"abc" + bytes([0])
        spliced = base[:cut] + gce + comment + base[cut:]
        dec, w, h = decode_gif(spliced)
        assert (w, h) == (2, 2)
        assert np.array_equal(dec, np.full((2, 2, 3), 9, dtype=np.uint8))

    def test_malformed_streams_normalize_to_clear_raise(self):
        good = encode_gif(noisy_rgb(4, 4, 5, seed=1))
        malformed = [
            b"GIF89a" + b"\x00" * 16,     # garbage after header
            good[:-8],                     # truncated mid-LZW
            b"GIF89a",                     # header only
            good[:13] + good[19:],         # GCT stripped → indexes missing
        ]
        for p in malformed:
            with pytest.raises(ValueError):
                decode_gif(p)
            with pytest.raises(NotImplementedError, match="GIF"):
                decode_image_real(p)

    def test_lzw_corrupt_code_raises(self):
        with pytest.raises(ValueError, match="LZW|corrupt"):
            # width 3 stream whose first code is 7 (undefined entry)
            _lzw_decode(2, bytes([0b00000111]), 4)

    def test_spark_media_plumbing_decodes_gif(self, spark):
        from autoaudit_spark.llm.multimodal import extract_media_features

        img = noisy_rgb(4, 7, 12, seed=5)
        mm = spark.createDataFrame(
            [(1, bytearray(encode_gif(img)))],
            "doc_id long, payload binary",
        )
        rows = (
            extract_media_features(mm, batch_decode=decode_image_real)
            .collect()
        )
        assert [(r["width"], r["height"], r["format"]) for r in rows] == [
            (7, 4, "gif"),
        ]


class TestGifProperties:
    def test_roundtrip_property_random_images(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=40),
            w=st.integers(min_value=1, max_value=40),
            n_colors=st.integers(min_value=1, max_value=256),
            interlace=st.booleans(),
            seed=st.integers(min_value=0, max_value=2**31),
        )
        def check(h, w, n_colors, interlace, seed):
            img = noisy_rgb(h, w, n_colors, seed)
            dec, dw, dh = decode_gif(encode_gif(img, interlace=interlace))
            assert (dw, dh) == (w, h)
            assert np.array_equal(dec, img)

        check()

    def test_lzw_raw_roundtrip_property(self):
        """LZW layer alone: random index streams at every min code size
        round-trip exactly (this is the layer with the width-sync and
        KwKwK traps)."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(
            mcs=st.integers(min_value=2, max_value=8),
            n=st.integers(min_value=0, max_value=3000),
            seed=st.integers(min_value=0, max_value=2**31),
        )
        def check(mcs, n, seed):
            rng = np.random.default_rng(seed)
            # runs of repeats mixed with noise — both LZW regimes
            vals = rng.integers(0, 1 << mcs, size=n)
            reps = rng.integers(1, 6, size=n)
            idx = bytes(np.repeat(vals, reps).astype(np.uint8)[:n])
            assert _lzw_decode(mcs, _lzw_encode(mcs, idx), len(idx)) == idx

        check()


class TestGifReviewFixes:
    def test_missing_end_with_pad_bits_decodes(self):
        """Review r7: a stream whose END code is missing and whose final
        byte pads with 1-bits must decode once the pixel count is
        satisfied — the pad bits must not be read as a corrupt code.
        Stream 0x44 0xFE at mcs=2: CLEAR, 0, 1, then pad."""
        assert _lzw_decode(2, bytes([0x44, 0xFE]), 2) == b"\x00\x01"

    def test_end_code_still_honored(self):
        # the hand-packed fixture bytes, via the raw layer
        assert _lzw_decode(2, bytes([0x44, 0x50]), 3) == b"\x00\x01\x00"
