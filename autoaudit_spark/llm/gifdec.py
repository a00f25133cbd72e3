"""Vendored pure-NumPy GIF decoder (r6 verdict, "Next round" #4): the
third sibling of `jpegdec.py` (r5) and `pngdec.py` (r6), completing the
vendored codec trio and retiring the last PIL-gated image branch.
Implements the PUBLIC GIF89a specification (CompuServe GIF89a, 1990;
also covers GIF87a):

- `decode_gif`: header + logical-screen-descriptor parse, global/local
  colour tables, extension-block walk (Graphic Control / comment /
  application extensions are structurally skipped; the first frame is
  returned opaque — thumbnail/feature kernels want pixel statistics,
  not alpha compositing),
  variable-width LSB-first LZW decompression (§22: initial width
  = min-code-size+1, CLEAR/END codes, table growth to 4096 with the
  deferred-clear convention, the KwKwK self-reference case), 4-pass
  interlace de-shuffling (§20), and palette expansion to an (H, W, 3)
  uint8 array. First image frame only — the repo's media kernels score
  stills; animation compositing (frame disposal) is out of scope.
- `encode_gif`: minimal single-frame GIF89a encoder (global palette
  built from the image, real variable-width LZW with table reset at
  4096, optional interlace) used by the round-trip tests so the LZW and
  interlace math is verified in-container with no external codec.

Pillow, when installed, is still preferred upstream (`_decode_pil`);
this is the fallback that makes the GIF branch executable and TESTED
wherever the repo runs. Malformed streams raise ValueError with the
structural reason; `decode_image_real` normalizes them.

Scale note: like the JPEG/PNG siblings, decoding runs inside the same
`mapInPandas`/`mapInArrow` Arrow batches as the BMP/netpbm kernels —
per-payload NumPy work, embarrassingly parallel, no driver state.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 1 << 12  # §22: GIF LZW codes never exceed 12 bits


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> bytes:
    """Variable-width LZW decompression (GIF89a §22, appendix F).

    Codes are packed LSB-first; the table holds ``2**mcs`` root codes
    plus CLEAR and END, grows by one entry per decoded code (the
    just-emitted string + first char of the next — the classic one-step
    lag), widens when the next assignable code would not fit, caps at
    4096 (deferred clear: stop growing until a CLEAR arrives)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"GIF LZW min code size {mcs} out of range")
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = table[: clear + 2]
                width = mcs + 1
                prev = None
                continue
            if code == end:
                if len(out) < n_pixels:
                    raise ValueError(
                        f"GIF LZW stream ended at {len(out)}/{n_pixels} pixels"
                    )
                return bytes(out[:n_pixels])
            if code < len(table) and code not in (clear, end):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"corrupt GIF LZW code {code}")
            out += entry
            if len(out) >= n_pixels:
                # tolerate a missing END code once the pixel count is
                # satisfied (sloppy encoders in the wild) — and stop
                # BEFORE interpreting the final byte's padding bits as
                # codes: pad bits can form an out-of-table value that
                # would masquerade as corruption (review r7)
                return bytes(out[:n_pixels])
            if prev is not None and len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ValueError(
        f"GIF LZW stream exhausted at {len(out)}/{n_pixels} pixels"
    )


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # §20: start, step


def _interlace_order(h: int) -> np.ndarray:
    """Row order in which an interlaced stream stores the image."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF data sub-block sequence; return (data, new_pos)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-block sequence truncated")
        sz = payload[pos]
        pos += 1
        if sz == 0:
            return bytes(out), pos
        if pos + sz > len(payload):
            raise ValueError("GIF sub-block overruns payload")
        out += payload[pos : pos + sz]
        pos += sz


def decode_gif(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode the FIRST image frame of a GIF87a/89a payload to an
    (H, W, 3) uint8 RGB array; returns (pixels, width, height)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF87a/GIF89a stream")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("GIF global colour table truncated")
        gct = (
            np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            .reshape(n, 3)
            .copy()
        )
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, all skippable
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            pos += 1  # label (0xF9 GCE / 0xFE comment / 0xFF application)
            _, pos = _sub_blocks(payload, pos)
        elif block == 0x2C:  # image descriptor — decode and return
            if pos + 9 > len(payload):
                raise ValueError("GIF image descriptor truncated")
            _left, _top, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            if w == 0 or h == 0:
                raise ValueError("GIF image has zero dimension")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(payload):
                    raise ValueError("GIF local colour table truncated")
                ct = (
                    np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
                    .reshape(n, 3)
                    .copy()
                )
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no colour table")
            if pos >= len(payload):
                raise ValueError("GIF image data truncated")
            mcs = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            idx = np.frombuffer(
                _lzw_decode(mcs, data, w * h), np.uint8
            )
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF palette index out of range")
            if ipacked & 0x40:  # interlaced: invert the 4-pass row order
                rows = np.empty(h, dtype=np.int64)
                rows[_interlace_order(h)] = np.arange(h)
                idx = idx.reshape(h, w)[rows].reshape(-1)
            return ct[idx].reshape(h, w, 3), w, h
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


# ---------------------------------------------------------------------------
# minimal encoder — test support (round-trips the decoder in-container)
# ---------------------------------------------------------------------------
class _LsbBitWriter:
    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """Greedy GIF LZW (§22): the encoder widens one assignment EARLIER
    than the decoder reads wider (the decoder's table lags one entry),
    i.e. after assigning code c it widens when c+1 == (1<<width)+1."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bw = _LsbBitWriter()
    bw.write(clear, width)
    prev = b""
    for ch in indices:
        cur = prev + bytes([ch])
        if cur in table:
            prev = cur
            continue
        bw.write(table[prev], width)
        if next_code < _MAX_CODE:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset (decoder tolerates via deferred clear)
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        prev = bytes([ch])
    if prev:
        bw.write(table[prev], width)
    bw.write(end, width)
    return bw.flush()


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame GIF89a from an (H, W, 3) uint8 array with ≤256
    distinct colours (global palette, real LZW, optional interlace)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif wants an (H, W, 3) uint8 array")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif supports at most 256 colours")
    # colour-table size is a power of two ≥ 2 (§18); mcs ≥ 2 (§22)
    bits = max(1, int(len(palette) - 1).bit_length())
    n_ct = 1 << bits
    mcs = max(2, bits)
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += ct.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    out.append(mcs)
    data = _lzw_encode(mcs, idx.reshape(-1).tobytes())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
