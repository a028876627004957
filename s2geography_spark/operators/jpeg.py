"""Baseline JPEG (JFIF, SOF0) codec — pure stdlib + NumPy, from scratch.

Decoder: full baseline spec — grayscale or YCbCr color, arbitrary
sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT segments,
16-bit quant precision, restart intervals, byte unstuffing.  Progressive
(SOF2), arithmetic coding, and 12-bit precision raise the
NotImplementedError external-library seam.

Encoder: baseline grayscale or 4:2:0 color with the Annex K quantization
and Huffman tables — enough to plant deterministic JPEG bytes in tests
and oracle queries (round-4 verdict: a real Common-Crawl multimodal
pipeline hits JPEG on page one; the reference repo has no image codecs —
this is engine-side pipeline surface, not a port target).

The entropy decode is a per-symbol Python loop (a Huffman bitstream is
inherently sequential); production deploys swap PIL/libjpeg-turbo into
``decode_image``'s codec table — the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> natural (row-major) position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# ITU-T T.81 Annex K reference tables
K_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32)  # in zigzag order? no: natural order rows — see below
K_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
               list(range(12)))
K_AC_LUMA = (
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
K_AC_CHROMA = (
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

# separable IDCT basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(coef: np.ndarray) -> np.ndarray:
    """(..., 8, 8) DCT coefficients -> spatial samples (float)."""
    return np.einsum("ux,...uv,vy->...xy", _M, coef, _M)


def _dct2(block: np.ndarray) -> np.ndarray:
    return np.einsum("ux,...xy,vy->...uv", _M, block, _M)


def _build_decoder(bits, vals):
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encoder(bits, vals):
    """symbol -> (code, length)."""
    dec = _build_decoder(bits, vals)
    return {sym: (code, length) for (length, code), sym in dec.items()}


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    marker and exposes it for restart handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.bits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.bits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.bits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.bits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bits < n:
            self._fill()
        v = (self.acc >> (self.bits - n)) & ((1 << n) - 1)
        self.bits -= n
        return v

    def decode(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self):
        """Align to the pending RSTn marker and resume after it."""
        self.bits = 0
        self.acc = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            # _fill stopped AT the marker without consuming it
            self.marker = None
            self.pos += 2
            return
        # marker not yet reached: scan forward for it
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) gray or (h, w, 3) RGB uint8."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt = {}
    huff = {}
    comps = None
    w = h = 0
    restart_interval = 0
    scan_pos = None
    scan_comps = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:           # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64,
                                        offset=sp).astype(np.int32)
                    sp += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64,
                                        offset=sp).astype(np.int32)
                    sp += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = tbl        # stored in zigzag order
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:         # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + nv])
                huff[(tc, th)] = _build_decoder(bits, vals)
                sp += 17 + nv
        elif marker == 0xC0:         # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG decodes natively")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/extended) requires "
                "external libraries; only baseline SOF0 decodes natively")
        elif marker == 0xDD:         # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:         # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, td_ta >> 4, td_ta & 0xF))
            scan_pos = pos
            break
    if comps is None or scan_pos is None:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                              dtype=np.float64)
        sc = next(s for s in scan_comps if s[0] == c["id"])
        c["dc_t"] = huff[(0, sc[1])]
        c["ac_t"] = huff[(1, sc[2])]
        c["q"] = qt[c["tq"]].astype(np.float64)
        c["pred"] = 0

    reader = _BitReader(buf, scan_pos)
    zz = ZIGZAG
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        t = reader.decode(c["dc_t"])
                        diff = _extend(reader.read(t), t) if t else 0
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.decode(c["ac_t"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16   # ZRL
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[zz[k]] = _extend(reader.read(s), s)
                            k += 1
                        block = _idct2(coef.reshape(8, 8) * c["q"])
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = block
    planes = []
    for c in comps:
        p = c["plane"] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, Annex K tables): gray or 4:2:0 color
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.bits += length
        while self.bits >= 8:
            b = (self.acc >> (self.bits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.bits -= 8

    def flush(self):
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)


def _encode_block(bw, block, q, dc_enc, ac_enc, pred):
    coef = np.rint(_dct2(block.astype(np.float64) - 128.0) / q).astype(int)
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_enc[0xF0]
            bw.write(c, l)
            run -= 16
        s = abs(v).bit_length()
        c, l = ac_enc[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        c, l = ac_enc[0x00]
        bw.write(c, l)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc, th, spec):
    bits, vals = spec
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def encode_jpeg(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JFIF bytes (Annex K
    tables at scale 1; color uses 4:2:0 subsampling; restart_interval > 0
    emits DRI + RSTn markers every that many MCUs)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    # quant tables in natural 8x8 for math, zigzag for the DQT segment
    q_luma_nat = K_LUMA_Q.reshape(8, 8).astype(np.float64)
    q_chroma_nat = K_CHROMA_Q.reshape(8, 8).astype(np.float64)
    dqt = _seg(0xDB, bytes([0x00])
               + bytes(int(x) for x in K_LUMA_Q.reshape(64)[ZIGZAG]))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt
    if not gray:
        out += _seg(0xDB, bytes([0x01])
                    + bytes(int(x) for x in K_CHROMA_Q.reshape(64)[ZIGZAG]))
    if gray:
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    else:
        sof = struct.pack(">BHHB", 8, h, w, 3) + \
            bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, K_DC_LUMA))
    out += _seg(0xC4, _dht_payload(1, 0, K_AC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, K_DC_CHROMA))
        out += _seg(0xC4, _dht_payload(1, 1, K_AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if gray:
        sos = bytes([1, 1, 0x00]) + bytes([0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    n_mcu = 0
    rst = 0

    def _maybe_restart(preds):
        nonlocal n_mcu, rst
        n_mcu += 1
        if restart_interval and n_mcu % restart_interval == 0:
            bw.flush()
            bw.out.append(0xFF)
            bw.out.append(0xD0 + rst % 8)
            rst += 1
            for k in preds:
                preds[k] = 0

    dc_l = _build_encoder(*K_DC_LUMA)
    ac_l = _build_encoder(*K_AC_LUMA)
    bw = _BitWriter()
    if gray:
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        plane = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)),
                       mode="edge")
        preds = {"y": 0}
        for by in range(ph // 8):
            for bx in range(pw // 8):
                preds["y"] = _encode_block(
                    bw, plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    q_luma_nat, dc_l, ac_l, preds["y"])
                _maybe_restart(preds)
    else:
        dc_c = _build_encoder(*K_DC_CHROMA)
        ac_c = _build_encoder(*K_AC_CHROMA)
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        ph = -(-h // 16) * 16
        pw = -(-w // 16) * 16
        y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        # 4:2:0: box-average chroma
        cb2 = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr2 = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        preds = {"y": 0, "cb": 0, "cr": 0}
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for by in range(2):
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        preds["y"] = _encode_block(
                            bw, y[y0:y0 + 8, x0:x0 + 8],
                            q_luma_nat, dc_l, ac_l, preds["y"])
                y0, x0 = my * 8, mx * 8
                preds["cb"] = _encode_block(bw, cb2[y0:y0 + 8, x0:x0 + 8],
                                            q_chroma_nat, dc_c, ac_c,
                                            preds["cb"])
                preds["cr"] = _encode_block(bw, cr2[y0:y0 + 8, x0:x0 + 8],
                                            q_chroma_nat, dc_c, ac_c,
                                            preds["cr"])
                _maybe_restart(preds)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
