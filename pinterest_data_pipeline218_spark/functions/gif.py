"""Dependency-free GIF codec (GIF87a/GIF89a decode, GIF89a encode).

The sixth native format in the imaging family (PPM, BMP, PNG, JPEG
baseline+progressive, WAV): full LZW entropy decode (variable code width
3..12 bits, clear/EOI codes, dictionary reset, sub-block stream),
global/local color tables, interlaced row reordering, graphic-control /
application / comment extension walking, and first-frame compositing onto
the logical screen (smaller first frames are placed at their offset over
the background color). The encoder writes a single-frame GIF89a with a
deterministic global palette and standard LZW compression, so
encode→decode round-trips EXACTLY for any image with ≤256 distinct
colors — which is what makes the format oracle-friendly: a palettized
fixture's decoded bytes are a closed-form function of its indices.

Deliberate subset, stated plainly: animation beyond the first frame is
metadata only (frames after the first are counted, not composited — the
decode contract is one RGB buffer), and a transparent first-frame index
renders as its palette color (the RGB contract has no alpha channel).
Every malformed input raises ImageFormatError — never IndexError /
struct.error — the same fuzz-pinned boundary as the other codecs
(functions/imaging.py).

Reference scope: beyond-reference (the reference never decodes pixels);
public format knowledge only (GIF89a specification / DEFLATE-era LZW).
"""

from __future__ import annotations

import struct

from .imaging import ImageFormatError

_GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH

# interlace passes: (row offset, row step) in pass order
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits an initial CLEAR, resets the dictionary at
    4096 entries, ends with EOI; codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < _DICT_LIMIT:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Inverse of _lzw_compress; tolerant of a missing EOI (common in the
    wild) but typed-strict on any structurally impossible code."""
    if not (2 <= min_code_size <= 11):
        raise ImageFormatError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    out = bytearray()

    def read(width: int) -> int | None:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code is None:
            raise ImageFormatError("truncated GIF LZW stream")
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ImageFormatError(f"impossible GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < _DICT_LIMIT:
            table.append(prev + entry[:1])
        # the decoder's table trails the encoder's by one entry (the
        # encoder adds AFTER emitting), so the width grows one entry
        # EARLY relative to the encoder's next_code == 1<<width check —
        # the classic GIF-LZW "early change"
        if len(table) == (1 << width) - 1 and width < _MAX_CODE_WIDTH:
            width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ImageFormatError("GIF LZW stream ended before the pixel count")
    return bytes(out[:n_pixels])


# ------------------------------------------------------------ container


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ImageFormatError("truncated GIF sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ImageFormatError("truncated GIF sub-block")
        out += data[pos : pos + n]
        pos += n


def _write_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, pixels: bytes) -> bytes:
    """Single-frame GIF89a from row-major RGB bytes. The palette is the
    image's distinct colors in ascending RGB order (deterministic);
    > 256 distinct colors raises (GIF is a palettized format — quantize
    upstream)."""
    # The module's typed-error contract holds at the ENCODER boundary too
    # (ADVICE r11): width/height > 65535 would escape as struct.error from
    # struct.pack("<HH", ...), and a 0x0 input would encode a payload
    # decode_gif rejects as implausible. Mirror the decoder's guard.
    if not (1 <= width <= 0xFFFF and 1 <= height <= 0xFFFF):
        raise ImageFormatError(
            f"GIF dimensions must be in [1, 65535], got {width}x{height}"
        )
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    colors = sorted({pixels[i : i + 3] for i in range(0, len(pixels), 3)})
    if len(colors) > 256:
        raise ImageFormatError(
            f"GIF needs <= 256 distinct colors, got {len(colors)}"
        )
    index_of = {c: i for i, c in enumerate(colors)}
    indices = bytes(
        index_of[pixels[i : i + 3]] for i in range(0, len(pixels), 3)
    )
    # GCT size field k -> 2^(k+1) entries
    k = 0
    while (2 << k) < len(colors):
        k += 1
    gct = b"".join(colors) + b"\x00\x00\x00" * ((2 << k) - len(colors))
    min_code = max(2, k + 1)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes((0x80 | (7 << 4) | k, 0, 0))  # GCT present, bg index 0
    out += gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes((min_code,))
    out += _write_subblocks(_lzw_compress(indices, min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) — the FIRST frame composited onto the logical
    screen (background color under a smaller frame); later frames are
    not rendered (see module docstring). Interlaced frames are
    de-interlaced. Any malformed structure raises ImageFormatError."""
    if data[:6] not in _GIF_MAGICS:
        raise ImageFormatError("not a GIF payload")
    if len(data) < 13:
        raise ImageFormatError("truncated GIF header")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed, bg = data[10], data[11]
    if sw <= 0 or sh <= 0 or sw * sh > 1 << 26:
        raise ImageFormatError(f"implausible GIF dimensions {sw}x{sh}")
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ImageFormatError("truncated GIF global color table")
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    while True:
        if pos >= len(data):
            raise ImageFormatError("GIF ended without an image or trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:
            raise ImageFormatError("GIF has no image data")
        if block == 0x21:  # extension: label + sub-blocks, all skippable
            if pos >= len(data):
                raise ImageFormatError("truncated GIF extension")
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ImageFormatError(f"unknown GIF block 0x{block:02x}")
        break
    if pos + 9 > len(data):
        raise ImageFormatError("truncated GIF image descriptor")
    left, top, w, h = struct.unpack_from("<HHHH", data, pos)
    ipacked = data[pos + 8]
    pos += 9
    if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
        raise ImageFormatError("GIF frame exceeds the logical screen")
    palette = gct
    if ipacked & 0x80:  # local color table wins
        n = 2 << (ipacked & 0x07)
        if pos + 3 * n > len(data):
            raise ImageFormatError("truncated GIF local color table")
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    if palette is None:
        raise ImageFormatError("GIF frame has no color table")
    if pos >= len(data):
        raise ImageFormatError("truncated GIF image data")
    min_code = data[pos]
    pos += 1
    payload, pos = _read_subblocks(data, pos)
    indices = _lzw_decompress(payload, min_code, w * h)
    if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
        rows = [b""] * h
        src = 0
        for offset, step in _INTERLACE_PASSES:
            for y in range(offset, h, step):
                rows[y] = indices[src * w : (src + 1) * w]
                src += 1
        indices = b"".join(rows)
    n_pal = len(palette) // 3
    if max(indices) >= n_pal:
        raise ImageFormatError("GIF pixel index outside the color table")
    # the background color indexes the GLOBAL table (the logical screen's
    # palette), independent of any frame-local table
    bg_rgb = b"\x00\x00\x00"
    if gct is not None and 3 * bg + 3 <= len(gct):
        bg_rgb = gct[3 * bg : 3 * bg + 3]
    out = bytearray(bg_rgb * (sw * sh))
    for y in range(h):
        row = indices[y * w : (y + 1) * w]
        base = ((top + y) * sw + left) * 3
        px = bytearray()
        for idx in row:
            px += palette[3 * idx : 3 * idx + 3]
        out[base : base + 3 * w] = px
    return sw, sh, bytes(out)
