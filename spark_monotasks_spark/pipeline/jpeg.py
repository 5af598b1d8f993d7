"""Baseline JPEG codec in pure numpy — no libjpeg/PIL.

Implements the minimum-but-real baseline profile: 8-bit, 4:4:4 (no
chroma subsampling), standard Annex-K quantization and Huffman tables,
sequential DCT, JFIF container.  The encoder exists to produce honest
fixtures; the decoder (`decode_jpeg_pixels`) is the production-shaped
piece — it parses DQT/DHT/SOF0/SOS, entropy-decodes the scan
(Huffman + DC prediction + AC run-length), dequantizes, inverse-zigzags,
applies the 2-D IDCT, and converts YCbCr→RGB.

Scope guards (return None, never raise): progressive (SOF2), subsampled,
arithmetic-coded, or >3-component streams.  Lossiness is the format's,
not ours: roundtrip error is bounded by the quantization table (tests
assert mean-abs-error, and DC/means survive almost exactly).
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (public JPEG standard) ---------------------------------

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


#: zigzag order: index i of this array = position in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard Huffman tables (Annex K.3): (bits-per-length 1..16, values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_encode_table(bits, values):
    """(symbol → (code, length)) from a (bits, values) spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, values):
    """((length, code) → symbol) for the decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


_DCT = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def encode_jpeg_pixels(
    rgb: np.ndarray, quality: int = 90
) -> bytes:
    """Encode an (h, w, 3) uint8 array as a baseline 4:4:4 JFIF JPEG."""
    h, w, _ = rgb.shape
    qy = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)
    dc_y = _huff_encode_table(*_DC_LUMA)
    ac_y = _huff_encode_table(*_AC_LUMA)
    dc_c = _huff_encode_table(*_DC_CHROMA)
    ac_c = _huff_encode_table(*_AC_CHROMA)

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw, 3), dtype=np.float64)
    padded[:h, :w] = rgb.astype(np.float64)
    padded[h:, :w] = padded[h - 1: h, :w]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1: w]
    ycc = _rgb_to_ycbcr(padded) - 128.0

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                block = ycc[by: by + 8, bx: bx + 8, comp]
                coef = _DCT @ block @ _DCT.T
                q = qy if comp == 0 else qc
                quant = np.round(coef.ravel() / q.reshape(8, 8).ravel()).astype(int)
                zz = quant[_ZIGZAG]
                dc_tab = dc_y if comp == 0 else dc_c
                ac_tab = ac_y if comp == 0 else ac_c
                diff = int(zz[0]) - prev_dc[comp]
                prev_dc[comp] = int(zz[0])
                size, amp = _magnitude(diff)
                code, length = dc_tab[size]
                writer.put(code, length)
                if size:
                    writer.put(amp, size)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tab[0xF0]  # ZRL
                        writer.put(code, length)
                        run -= 16
                    size, amp = _magnitude(v)
                    code, length = ac_tab[(run << 4) | size]
                    writer.put(code, length)
                    writer.put(amp, size)
                    run = 0
                if run:
                    code, length = ac_tab[0x00]  # EOB
                    writer.put(code, length)
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in table.reshape(8, 8).ravel()[_ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, values = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))

    app0 = seg(0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qy)
        + dqt(1, qc)
        + sof
        + dht(0, 0, _DC_LUMA)
        + dht(1, 0, _AC_LUMA)
        + dht(0, 1, _DC_CHROMA)
        + dht(1, 1, _AC_CHROMA)
        + sos
        + scan
        + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        while self.nbits < 25:
            if self.pos >= len(self.data):
                return self.nbits > 0
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    self.pos -= 1  # a real marker: stop
                    return self.nbits > 0
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        return True

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise EOFError
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


def _huff_read(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.get(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def decode_jpeg_pixels(b: bytes):
    """Decode a baseline 4:4:4 JPEG to an (h, w, 3) uint8 array.
    Returns None for anything outside the supported profile or corrupt
    input (data, not errors)."""
    try:
        if not b or b[:2] != b"\xff\xd8":
            return None
        quant: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}
        w = h = None
        comp_q: dict[int, int] = {}
        comp_tabs: dict[int, tuple[int, int]] = {}
        comp_order: list[int] = []
        i = 2
        scan_start = None
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:
                break
            length = struct.unpack(">H", b[i + 2: i + 4])[0]
            payload = b[i + 4: i + 2 + length]
            if marker == 0xDB:
                p = 0
                while p < len(payload):
                    pq, tq = payload[p] >> 4, payload[p] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables unsupported
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[_ZIGZAG] = np.frombuffer(
                        payload[p + 1: p + 65], dtype=np.uint8
                    ).astype(np.int32)
                    quant[tq] = tbl
                    p += 65
            elif marker == 0xC0:
                _prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
                if ncomp != 3:
                    return None
                for c in range(ncomp):
                    cid, samp, tq = payload[6 + 3 * c: 9 + 3 * c]
                    if samp != 0x11:
                        return None  # subsampling unsupported
                    comp_q[cid] = tq
            elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
                return None  # non-baseline frame
            elif marker == 0xC4:
                p = 0
                while p < len(payload):
                    cls, tid = payload[p] >> 4, payload[p] & 0xF
                    bits = list(payload[p + 1: p + 17])
                    nvals = sum(bits)
                    values = list(payload[p + 17: p + 17 + nvals])
                    huff[(cls, tid)] = _huff_decode_table(bits, values)
                    p += 17 + nvals
            elif marker == 0xDA:
                ns = payload[0]
                if ns != 3:
                    return None  # non-interleaved scans: out of profile
                for c in range(ns):
                    cid = payload[1 + 2 * c]
                    tabs = payload[2 + 2 * c]
                    comp_tabs[cid] = (tabs >> 4, tabs & 0xF)
                    comp_order.append(cid)
                scan_start = i + 2 + length
                break
            i += 2 + length
        if scan_start is None or w is None:
            return None
        reader = _BitReader(b[scan_start:])
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        out = np.zeros((ph, pw, 3), dtype=np.float64)
        prev_dc = {cid: 0 for cid in comp_order}
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci, cid in enumerate(comp_order):
                    dc_tid, ac_tid = comp_tabs[cid]
                    dc_tab = huff[(0, dc_tid)]
                    ac_tab = huff[(1, ac_tid)]
                    zz = np.zeros(64, dtype=np.int64)
                    size = _huff_read(reader, dc_tab)
                    diff = _extend(reader.get(size), size)
                    prev_dc[cid] += diff
                    zz[0] = prev_dc[cid]
                    k = 1
                    while k < 64:
                        rs = _huff_read(reader, ac_tab)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            return None
                        zz[k] = _extend(reader.get(size), size)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = zz * quant[comp_q[cid]][_ZIGZAG]
                    block = _DCT.T @ coef.reshape(8, 8) @ _DCT
                    out[by: by + 8, bx: bx + 8, ci] = block
        rgb = _ycbcr_to_rgb(out + 128.0)
        return np.clip(np.round(rgb[:h, :w]), 0, 255).astype(np.uint8)
    except Exception:
        return None
