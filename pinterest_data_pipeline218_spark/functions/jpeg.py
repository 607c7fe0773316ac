"""Baseline JPEG (ITU-T T.81) codec — pure Python + numpy, no codec library.

Decoder: baseline sequential DCT, 8-bit, Huffman-coded — the profile every
JFIF camera/browser JPEG uses. Handles 1- and 3-component images, sampling
factors 1-2 per axis (4:4:4 / 4:2:2 / 4:2:0), restart intervals (DRI/RSTn),
byte stuffing, MCU edge padding/cropping. Progressive (SOF2), arithmetic
coding, 12-bit precision, and hierarchical modes raise a typed
ImageFormatError — those stay behind the documented codec boundary.

Encoder: baseline sequential, unit (all-ones) quantisation tables and
explicit DHT tables, grayscale or 4:4:4 color. Unit quantisation makes the
transform loss the only loss: a block-constant image round-trips EXACTLY
(DCT of a constant block is DC-only; AC quantise to zero at any table),
which is what gives the gated mm_image_decode fixture a closed-form pixel
oracle, and arbitrary images round-trip within ±2/channel (float DCT
rounding), pytest-bounded.

The IDCT/DCT run as one 8x8 matrix sandwich in numpy per block — the Arrow
mapInPandas kernels batch hundreds of blocks per call, so the per-block
Python overhead is the header/Huffman bit loop only.

Reference scope: beyond-reference (the reference pipeline has no media
codecs); public T.81/JFIF specification semantics throughout.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageFormatError

# zigzag scan order: ZZ[k] = (row, col) of the k-th coefficient
_ZZ: list[tuple[int, int]] = []
for _d in range(15):
    _rows = list(range(max(0, _d - 7), min(_d, 7) + 1))
    for _r in _rows if _d % 2 == 1 else reversed(_rows):
        _ZZ.append((_r, _d - _r))

# orthonormal DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1)u*pi/16);
# spatial = A.T @ coeffs @ A, coeffs = A @ spatial @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _A[_u, _x] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ------------------------------------------------------------------ decode


def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing.
    Stops at any non-stuffing marker; RSTn markers are consumed by
    `restart()`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: only restart() may cross
                raise ImageFormatError("entropy data ended at restart marker")
            else:
                raise ImageFormatError("entropy data ended at marker")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageFormatError("invalid Huffman code in entropy data")

    def restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n % 8):
            raise ImageFormatError("missing restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): a `size`-bit magnitude with a
    leading 0 bit encodes a negative value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major RGB bytes) from a baseline JPEG."""
    if data[:3] != b"\xff\xd8\xff":
        raise ImageFormatError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    width = height = 0
    restart_interval = 0
    scan_pos = -1
    scan_tables: dict[int, tuple[int, int]] = {}  # cid -> (Td, Ta)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ImageFormatError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                tbl = np.zeros((8, 8))
                for k in range(64):
                    if pq:
                        val = struct.unpack(">H", seg[p : p + 2])[0]
                        p += 2
                    else:
                        val = seg[p]
                        p += 1
                    tbl[_ZZ[k]] = val
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = seg[p + 17 : p + 17 + nvals]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, values)
                p += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            if seg[0] != 8:
                raise ImageFormatError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * i]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                "only baseline sequential JPEG supported (progressive/"
                "arithmetic/hierarchical are behind the codec boundary)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tt = seg[2 + 2 * i]
                scan_tables[cid] = (tt >> 4, tt & 0xF)
            scan_pos = pos + seglen
            break
        # APPn/COM/others: skip
        pos += seglen
    if not comps or scan_pos < 0:
        raise ImageFormatError("truncated JPEG: missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * 8 * v, mcus_x * 8 * h)) for _, h, v, _ in comps
    ]
    reader = _BitReader(data, scan_pos)
    pred = [0] * len(comps)
    n_rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart(n_rst)
            n_rst += 1
            pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, h, v, tq) in enumerate(comps):
            dc_tbl = huff_dc[scan_tables[cid][0]]
            ac_tbl = huff_ac[scan_tables[cid][1]]
            for by in range(v):
                for bx in range(h):
                    coeffs = np.zeros((8, 8))
                    size = reader.decode_symbol(dc_tbl)
                    pred[ci] += _extend(reader.receive(size), size)
                    coeffs[0, 0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tbl)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ImageFormatError("AC run past block end")
                        coeffs[_ZZ[k]] = _extend(reader.receive(size), size)
                        k += 1
                    block = _A.T @ (coeffs * qt[tq]) @ _A + 128.0
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample each plane to full MCU-grid resolution, then crop
    full = []
    for (cid, h, v, tq), plane in zip(comps, planes):
        if h < hmax or v < vmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        full.append(plane[:height, :width])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack(
            [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
            axis=-1,
        )
    else:
        raise ImageFormatError(f"{len(full)}-component JPEG not supported")
    return width, height, rgb.tobytes()


# ------------------------------------------------------------------ encode

# encoder-side Huffman tables: canonical, explicit in the written DHT, chosen
# for simplicity over compression — 12 DC categories at 4 bits (codes
# 0000..1011; the reserved all-ones code is never assigned), 162 AC symbols
# at 9 bits (codes 0..161 of 512; all-ones unused)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALUES = bytes(range(12))
_ENC_AC_VALUES = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALUES), 0, 0, 0, 0, 0, 0, 0]


def _enc_codes(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code) for the canonical table."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALUES)
_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALUES)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _write_block(w: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """Huffman-encode one quantised block (zigzag, DC diff, AC RLE);
    returns the new DC predictor."""
    dc = int(coeffs[0, 0])
    diff = dc - pred
    size = _category(diff)
    length, code = _DC_CODES[size]
    w.write(code, length)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    zz = [int(coeffs[_ZZ[k]]) for k in range(64)]
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_CODES[0xF0]
            w.write(code, length)
            run -= 16
        size = _category(v)
        length, code = _AC_CODES[(run << 4) | size]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = _AC_CODES[0x00]  # EOB
        w.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _pad_edges(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a plane to (ph, pw) by replicating the last row/col (standard
    MCU edge padding)."""
    h, w = plane.shape
    if h < ph:
        plane = np.vstack([plane, np.repeat(plane[-1:, :], ph - h, axis=0)])
    if w < pw:
        plane = np.hstack([plane, np.repeat(plane[:, -1:], pw - w, axis=1)])
    return plane


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    grayscale: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from row-major RGB bytes: unit quantisation tables
    (transform-only loss — block-constant images round-trip exactly),
    single-component grayscale (uses the R channel; pass R=G=B for true
    gray) or interleaved color at 4:4:4 or 4:2:0 (2x2-averaged chroma).
    With restart_interval > 0, emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's byte-align/reset path)."""
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    if subsampling not in ("444", "420"):
        raise ImageFormatError(f"unsupported subsampling {subsampling!r}")
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    if grayscale:
        planes = [rgb[:, :, 0]]
        samp = [(1, 1)]
    else:
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            # 2x2 box-average chroma; pad odd dimensions by edge replication
            cb = _pad_edges(cb, (height + 1) // 2 * 2, (width + 1) // 2 * 2)
            cr = _pad_edges(cr, cb.shape[0], cb.shape[1])
            cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4
            cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    ncomp = len(planes)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to its full MCU-grid size up front
    planes = [
        _pad_edges(p, mcus_y * 8 * v, mcus_x * 8 * h)
        for p, (h, v) in zip(planes, samp)
    ]
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT 0: unit table
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALUES)
    out += _seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALUES)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    w = _BitWriter()
    pred = [0] * ncomp
    n_rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (plane, (h, v)) in enumerate(zip(planes, samp)):
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    block = plane[y0 : y0 + 8, x0 : x0 + 8]
                    coeffs = np.round(_A @ (block - 128.0) @ _A.T)
                    pred[ci] = _write_block(w, coeffs, pred[ci])
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
