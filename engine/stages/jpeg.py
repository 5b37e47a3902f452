"""Baseline JPEG (JFIF) encode/decode in pure stdlib + NumPy — the
third REAL compressed codec behind the multimodal decode stage (next to
PNG and PCM WAV, engine/stages/multimodal.py).

Profile: baseline sequential DCT (SOF0), 8-bit, 3-component YCbCr,
4:4:4 (no chroma subsampling), standard Annex K quantization and
Huffman tables, no restart markers. The decoder verifies the profile
and fails loudly outside it. DCT/IDCT/quantization vectorize across
ALL blocks at once (einsum); only the entropy coder walks bits in
Python — media payloads are KB-sized by contract (multimodal.py module
docstring), the same bounded-loop budget the PNG Paeth path uses.

JPEG is lossy: round-trip tests assert PSNR bounds and exact recovery
of flat blocks (where quantization is exact), not byte equality —
unlike the PPM/WAV/PNG codecs. Decode itself is bit-exact
deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables ---------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# standard Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _canonical_codes(bits, values):
    """JPEG canonical Huffman: {symbol: (code, length)}."""
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


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5


_DCTM = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] \
        + 0.5 * f[..., 2] + 128.0
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] \
        - 0.081312 * f[..., 2] + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane (H,W multiples of 8) -> (n, 8, 8) row-major."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF bytes (4:4:4, Annex K tables)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    # pad to multiples of 8 with edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = _rgb_to_ycbcr(rgb)
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    coefs = []
    for ci in range(3):
        qt = qt_l if ci == 0 else qt_c
        blocks = _blocks(ycc[..., ci]) - 128.0
        dct = np.einsum("ij,njk,lk->nil", _DCTM, blocks, _DCTM)
        q = np.round(dct / qt).astype(np.int64)
        coefs.append(q.reshape(-1, 64)[:, ZIGZAG])

    enc = {"dl": _canonical_codes(*_DC_LUMA),
           "dc": _canonical_codes(*_DC_CHROMA),
           "al": _canonical_codes(*_AC_LUMA),
           "ac": _canonical_codes(*_AC_CHROMA)}
    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcus = (ph // 8) * (pw // 8)
    for m in range(n_mcus):
        for ci in range(3):
            dc_t = enc["dl"] if ci == 0 else enc["dc"]
            ac_t = enc["al"] if ci == 0 else enc["ac"]
            zz = coefs[ci][m]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s, bits = _magnitude(diff)
            code, ln = dc_t[s]
            bw.write(code, ln)
            if s:
                bw.write(bits, s)
            run = 0
            nz = np.flatnonzero(zz[1:]) + 1
            last = nz[-1] if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_t[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s, bits = _magnitude(v)
                code, ln = ac_t[(run << 4) | s]
                bw.write(code, ln)
                bw.write(bits, s)
                run = 0
            if last < 63:
                code, ln = ac_t[0x00]  # EOB
                bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid])
                   + bytes(tbl.reshape(-1)[ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # SOF carries the ORIGINAL dimensions (per spec); MCU counts are
    # ceil(dim/8) on the decode side and the padding is cropped there
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xFF\xD8" + app0 + dqt(0, qt_l) + dqt(1, qt_c)
            + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
            + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
            + sof + sos + scan + b"\xFF\xD9")


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # past the scan end: feed 1-bits (padding convention)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError(
                        "restart markers not supported (encoder never "
                        "emits them; re-encode without DRI)")
                else:
                    # EOI or next segment: rewind, feed padding
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table) -> int:
        """table: {length: {code: symbol}} canonical decode."""
        self._fill()
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get(length, {}).get(code)
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _decode_table(bits, values):
    codes = _canonical_codes(bits, values)
    out: dict[int, dict[int, int]] = {}
    for sym, (code, length) in codes.items():
        out.setdefault(length, {})[code] = sym
    return out


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (profile-checked:
    SOF0, 8-bit, 3 components, 4:4:4, no restart intervals)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict] = {}
    sof = None
    comp_spec = None
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = struct.unpack(">H", payload[pos: pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2: pos + 4])
        body = payload[pos + 4: pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                prec_id = body[i]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body, np.uint8, 64, i + 1) \
                    .astype(np.int64)[_UNZIGZAG].reshape(8, 8)
                qts[prec_id & 0xF] = tbl
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                cls_id = body[i]
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                hts[(cls_id >> 4, cls_id & 0xF)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xFFC0:
            prec, ph, pw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 3:
                raise ValueError("need 8-bit 3-component baseline JPEG")
            comps = []
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c: 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, qid))
            sof = (ph, pw)
            comp_spec = comps
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xFFDA:
            ns = body[0]
            sel = {}
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tids >> 4, tids & 0xF)
            scan_start = pos + 2 + length
            scan_sel = sel
            break
        pos += 2 + length
    if sof is None or scan_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    ph, pw = sof
    bh, bw_ = -(-ph // 8), -(-pw // 8)
    n_mcus = bh * bw_
    br = _BitReader(payload[scan_start:])
    coefs = [np.zeros((n_mcus, 64), np.int64) for _ in range(3)]
    pred = [0, 0, 0]
    for m in range(n_mcus):
        for ci, (cid, qid) in enumerate(comp_spec):
            dc_tid, ac_tid = scan_sel[cid]
            dc_t, ac_t = hts[(0, dc_tid)], hts[(1, ac_tid)]
            s = br.huff(dc_t)
            diff = _extend(br.bits(s), s) if s else 0
            pred[ci] += diff
            zz = coefs[ci][m]
            zz[0] = pred[ci]
            k = 1
            while k <= 63:
                rs = br.huff(ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                zz[k] = _extend(br.bits(s), s)
                k += 1
    planes = []
    for ci, (cid, qid) in enumerate(comp_spec):
        qt = qts[qid]
        blocks = coefs[ci][:, _UNZIGZAG].reshape(-1, 8, 8) * qt
        pix = np.einsum("ji,njk,kl->nil", _DCTM, blocks.astype(np.float64),
                        _DCTM) + 128.0
        plane = (pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw_ * 8))
        planes.append(plane[:ph, :pw])
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
