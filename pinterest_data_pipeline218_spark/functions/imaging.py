"""Pure-Python codecs for uncompressed image formats (PPM P6, 24-bit BMP).

The multimodal operators treat media as opaque binary columns and run
decode kernels as Arrow-batched `mapInPandas` functions. This container
ships no codec library (no PIL), but uncompressed formats need none: a
PPM or BMP payload is a small header plus raw pixel bytes. These codecs
make the decode step REAL — header parsing, dimension extraction, pixel
access, re-encoding — for the formats where that's possible without a
dependency; compressed formats (JPEG/PNG/...) still fall through to the
documented codec-boundary stub in operators/multimodal.py.

All functions are bytes-in/bytes-out with explicit (width, height,
pixels) tuples — `pixels` is the row-major RGB byte string
(len == width * height * 3) regardless of the container format's own
row order or channel order.
"""

from __future__ import annotations

import struct


class ImageFormatError(ValueError):
    """Payload is not a decodable image of the claimed format."""


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from row-major RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) from a binary PPM. Handles the full header
    grammar: arbitrary whitespace between tokens and '#' comments."""
    if data[:2] != b"P6":
        raise ImageFormatError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageFormatError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    width, height, maxval = tokens
    if maxval != 255:
        raise ImageFormatError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    pixels = data[pos : pos + need]
    if len(pixels) != need:
        raise ImageFormatError("truncated PPM pixel data")
    return width, height, pixels


# ------------------------------------------------------------ BMP (24-bit)

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_DIB_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from row-major RGB bytes —
    bottom-up rows, BGR channel order, rows padded to 4 bytes, exactly as
    the format specifies."""
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    row_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = pixels[base + x * 3 : base + x * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    body = b"".join(rows)
    offset = _BMP_HEADER.size + _DIB_HEADER.size
    head = _BMP_HEADER.pack(b"BM", offset + len(body), 0, 0, offset)
    dib = _DIB_HEADER.pack(
        _DIB_HEADER.size, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return head + dib + body


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) from a 24-bit uncompressed BMP. Handles both
    bottom-up (positive height) and top-down (negative height) layouts."""
    if data[:2] != b"BM":
        raise ImageFormatError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    (dib_size, width, height, _planes, bpp, compression, *_rest) = _DIB_HEADER.unpack_from(
        data, _BMP_HEADER.size
    )
    if dib_size < _DIB_HEADER.size or bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"unsupported BMP variant (dib={dib_size}, bpp={bpp}, comp={compression})"
        )
    top_down = height < 0
    height = abs(height)
    stride = width * 3 + ((-(width * 3)) % 4)
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = offset + src_row * stride
        row = data[base : base + width * 3]
        if len(row) != width * 3:
            raise ImageFormatError("truncated BMP pixel data")
        dst = y * width * 3
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# ------------------------------------------------------------- dispatch


def sniff_format(data: bytes) -> str | None:
    """'ppm' / 'bmp' for the natively decodable formats, else None."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    return None


def decode_any(data: bytes) -> tuple[str, int, int, bytes]:
    """(format, width, height, rgb) for a natively decodable payload;
    ImageFormatError for anything else (caller decides whether a codec
    library fallback exists)."""
    fmt = sniff_format(data)
    if fmt == "ppm":
        return ("ppm", *decode_ppm(data))
    if fmt == "bmp":
        return ("bmp", *decode_bmp(data))
    raise ImageFormatError("payload is not an uncompressed PPM/BMP image")


def encode(fmt: str, width: int, height: int, pixels: bytes) -> bytes:
    if fmt == "ppm":
        return encode_ppm(width, height, pixels)
    if fmt == "bmp":
        return encode_bmp(width, height, pixels)
    raise ImageFormatError(f"unsupported encode format {fmt!r}")


def resize_nearest(
    width: int, height: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a row-major RGB buffer — the standard
    floor(dst * src / new) index mapping."""
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = y * height // new_h
        src_base = sy * width * 3
        dst_base = y * new_w * 3
        for x in range(new_w):
            sx = x * width // new_w
            out[dst_base + x * 3 : dst_base + x * 3 + 3] = pixels[
                src_base + sx * 3 : src_base + sx * 3 + 3
            ]
    return bytes(out)
