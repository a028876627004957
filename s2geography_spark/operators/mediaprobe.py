"""Container/metadata probing for real-world media formats.

A 100 TB multimodal ingest runs a cheap METADATA pass over every object
(route by modality, drop corrupt/over-long items, plan frame sampling,
shard at keyframes) and a full decode only on the selected subset.  This
module implements the metadata pass natively from the public specs —
no external codec libraries:

- **MP3 / MPEG audio** (`probe_mp3`): ID3v2 skip + frame-header walk
  (sync, version, layer, bitrate/samplerate tables, padding) giving frame
  count, duration, average bitrate, and a VBR flag — without touching a
  single audio sample.  ISO/IEC 11172-3 header layout.
- **H.264 Annex-B** (`probe_h264`): start-code NAL split, NAL-type
  histogram, keyframe (IDR) byte offsets for container-level frame
  sampling/sharding, and a full SPS parse (exp-Golomb, emulation-
  prevention stripping, cropping arithmetic) for width/height/profile.
  ITU-T H.264 §7.3.2.1.
- **Images** (`probe_image`): dimensions + channels from PNG IHDR,
  JPEG SOF markers, or the PPM/PGM header — no pixel decode.

Full MP3 sample decode and H.264 slice decode remain the documented
external-library seams in `multimodal.py`; everything here is the part
of those formats a distributed pipeline needs on the hot path.  The
Spark surface is `probe_media_df` (mapInPandas over binary columns,
per-batch Python only at the codec boundary, like multimodal.py).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------- MP3 ---

# bitrate kbps by [version-group][bitrate_index]; Layer III only (the
# "MP3" seam).  version-group 0 = MPEG-1, 1 = MPEG-2/2.5.
_L3_BITRATE = (
    (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
)
_SAMPLE_RATE = {  # by version bits (B): 00=2.5, 10=2, 11=1
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _id3v2_size(buf: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if buf[:3] != b"ID3" or len(buf) < 10:
        return 0
    b = buf[6:10]
    return 10 + ((b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14
                 | (b[2] & 0x7F) << 7 | (b[3] & 0x7F))


def probe_mp3(buf: bytes) -> dict:
    """Walk MPEG-audio Layer III frame headers.

    Returns {frames, duration_ms, sample_rate, bitrate_kbps (mean),
    vbr (bool)}.  Raises ValueError when no valid frame is found (not a
    NotImplementedError: this IS the native MP3 surface; only sample
    decode is the external seam)."""
    pos = _id3v2_size(buf)
    n = len(buf)
    frames = 0
    samples = 0
    rate = None
    bitrates = []
    while pos + 4 <= n:
        h = struct.unpack_from(">I", buf, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            if frames:
                break  # trailing tag/garbage after a valid frame run
            pos += 1  # resync: scan forward to the first header
            continue
        ver = (h >> 19) & 0x3   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = (h >> 17) & 0x3  # 1 = Layer III
        if ver == 1 or layer != 1:
            raise ValueError(
                f"unsupported MPEG audio (version bits {ver}, layer bits "
                f"{layer}): only Layer III probes natively")
        bi = (h >> 12) & 0xF
        si = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        if bi in (0, 15) or si == 3:
            raise ValueError("free-form/invalid bitrate or sample rate")
        vgroup = 0 if ver == 3 else 1
        kbps = _L3_BITRATE[vgroup][bi]
        sr = _SAMPLE_RATE[ver][si]
        if rate is None:
            rate = sr
        spf = 1152 if ver == 3 else 576  # samples per Layer-III frame
        flen = (spf // 8) * kbps * 1000 // sr + pad
        if flen <= 4:
            raise ValueError("degenerate frame length")
        frames += 1
        samples += spf
        bitrates.append(kbps)
        pos += flen
    if not frames:
        raise ValueError("no MPEG audio frame found")
    return {
        "frames": frames,
        "duration_ms": int(round(samples * 1000.0 / rate)),
        "sample_rate": rate,
        "bitrate_kbps": int(round(sum(bitrates) / len(bitrates))),
        "vbr": len(set(bitrates)) > 1,
    }


def make_mp3(n_frames: int, *, kbps: int = 64, rate: int = 22050,
             id3: bytes = b"") -> bytes:
    """Deterministic header-valid MPEG-2 Layer III stream (zero payloads)
    for fixtures: the probe path exercises the real header arithmetic
    without shipping audio content."""
    bi = _L3_BITRATE[1].index(kbps)
    si = _SAMPLE_RATE[2].index(rate)
    h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) \
        | (bi << 12) | (si << 10)
    flen = (576 // 8) * kbps * 1000 // rate
    frame = struct.pack(">I", h) + b"\x00" * (flen - 4)
    out = b""
    if id3:
        sz = len(id3)
        ss = bytes(((sz >> s) & 0x7F for s in (21, 14, 7, 0)))
        out = b"ID3\x04\x00\x00" + ss + id3
    return out + frame * n_frames


# -------------------------------------------------------------- H.264 ---

class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) exp-Golomb (H.264 §9.1)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def u(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb overrun")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, nbits: int):
        self.bits.extend((v >> (nbits - 1 - i)) & 1 for i in range(nbits))

    def ue(self, v: int):
        k = v + 1
        nb = k.bit_length()
        self.u(0, nb - 1)
        self.u(k, nb)

    def bytes_aligned(self) -> bytes:
        b = self.bits + [1]  # rbsp_stop_one_bit
        while len(b) % 8:
            b.append(0)
        return bytes(int("".join(map(str, b[i:i + 8])), 2)
                     for i in range(0, len(b), 8))


def _strip_emulation(data: bytes) -> bytes:
    """Remove emulation_prevention_three_byte (00 00 03 -> 00 00)."""
    return data.replace(b"\x00\x00\x03", b"\x00\x00")


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128,
                  138, 139, 134, 135}


def parse_sps(rbsp: bytes) -> dict:
    """seq_parameter_set_data (H.264 §7.3.2.1.1) -> profile/level/dims."""
    r = _BitReader(_strip_emulation(rbsp))
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    r.ue()  # sps id
    chroma = 1
    if profile in _HIGH_PROFILES:
        chroma = r.ue()
        if chroma == 3:
            r.u(1)  # separate_colour_plane
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma != 3 else 12):
                if r.u(1):
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_allowed
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (§7.4.2.1.1): 4:2:0 -> x2; vertical also x(2-fmo)
    cx = 1 if chroma == 3 else 2 if chroma in (1, 2) else 1
    cy = (1 if chroma == 3 else 2 if chroma == 1 else 1) \
        * (2 - frame_mbs_only)
    width = w_mbs * 16 - (crop_l + crop_r) * cx
    height = (2 - frame_mbs_only) * h_units * 16 - (crop_t + crop_b) * cy
    return {"profile_idc": profile, "level_idc": level,
            "width": width, "height": height,
            "frame_mbs_only": bool(frame_mbs_only)}


def make_sps(width: int, height: int, *, profile: int = 66,
             level: int = 30) -> bytes:
    """Baseline-profile SPS RBSP for a multiple-of-16 frame size
    (fixture generator — the inverse of parse_sps for the no-crop case)."""
    if width % 16 or height % 16:
        raise ValueError("fixture SPS requires multiple-of-16 dimensions")
    w = _BitWriter()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)        # sps id
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(0)        # pic_order_cnt_type 0
    w.ue(0)        # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)        # max_num_ref_frames
    w.u(0, 1)      # gaps allowed
    w.ue(width // 16 - 1)
    w.ue(height // 16 - 1)
    w.u(1, 1)      # frame_mbs_only
    w.u(1, 1)      # direct_8x8
    w.u(0, 1)      # no cropping
    w.u(0, 1)      # no VUI
    return w.bytes_aligned()


def split_nals(buf: bytes) -> list[tuple[int, int, int]]:
    """Annex-B start-code split -> [(payload_offset, length, nal_type)].
    Both 3- and 4-byte start codes; offsets index the NAL header byte."""
    out = []
    i = 0
    n = len(buf)
    starts = []
    while True:
        j = buf.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        s = j + 3
        # a 00 00 00 01 start code owns the extra leading zero
        starts.append(s)
        i = s
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        while e > s and buf[e - 1] == 0 and k + 1 < len(starts):
            e -= 1  # the next start code's leading zeros
        out.append((s, e - s, buf[s] & 0x1F))
    if not out:
        raise ValueError("no Annex-B start code found")
    return out


def probe_h264(buf: bytes) -> dict:
    """NAL inventory + SPS dims for an Annex-B byte stream.

    Returns {n_nals, n_idr, n_sps, keyframe_offsets, width, height,
    profile_idc, level_idc}.  Keyframe offsets enable container-level
    frame sampling / shard-at-keyframe without slice decode (the decode
    itself stays the external seam in multimodal.py)."""
    nals = split_nals(buf)
    sps: Optional[dict] = None
    n_idr = n_sps = n_slices = 0
    key_offsets = []
    for off, ln, typ in nals:
        if typ == 7:
            n_sps += 1
            if sps is None:
                sps = parse_sps(buf[off + 1: off + ln])
        elif typ == 5:
            n_idr += 1
            n_slices += 1
            key_offsets.append(off)
        elif typ == 1:
            n_slices += 1
    if sps is None:
        raise ValueError("no SPS NAL in stream")
    return {"n_nals": len(nals), "n_idr": n_idr, "n_sps": n_sps,
            "n_slices": n_slices, "keyframe_offsets": key_offsets, **sps}


def make_h264(width: int, height: int, n_gops: int, *,
              frames_per_gop: int = 4) -> bytes:
    """Deterministic Annex-B fixture: SPS + PPS, then per GOP one IDR NAL
    and (frames_per_gop-1) non-IDR NALs with tiny deterministic payloads."""
    sc = b"\x00\x00\x00\x01"
    pps = bytes([0x68, 0xCE, 0x38, 0x80])  # minimal PPS (id 0)
    out = [sc, bytes([0x67]), make_sps(width, height), sc, pps]
    for g in range(n_gops):
        out += [sc, bytes([0x65]), bytes([(g * 7 + i) % 251 or 1
                                          for i in range(8)])]
        for f in range(frames_per_gop - 1):
            out += [sc, bytes([0x41]), bytes([(g * 13 + f * 3 + i) % 251
                                              or 1 for i in range(6)])]
    return b"".join(out)


# ------------------------------------------------------------- images ---

def probe_image(buf: bytes) -> dict:
    """(format, width, height, channels) from the header only."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", buf, 16)
        color = buf[25]
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color, 0)
        return {"format": "png", "width": w, "height": h, "channels": ch}
    if buf[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                pos += 1
                continue
            marker = buf[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = struct.unpack_from(">H", buf, pos + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", buf, pos + 5)
                return {"format": "jpeg", "width": w, "height": h,
                        "channels": buf[pos + 9]}
            pos += 2 + seglen
        raise ValueError("jpeg without SOF marker")
    if buf[:2] in (b"P5", b"P6"):
        parts = buf[2:64].split()
        return {"format": "ppm", "width": int(parts[0]),
                "height": int(parts[1]),
                "channels": 3 if buf[:2] == b"P6" else 1}
    raise ValueError("unknown image container")


# -------------------------------------------------------- Spark surface ---

PROBE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_keyframes", T.IntegerType()),
    T.StructField("bitrate_kbps", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def probe_media_df(df: DataFrame, *, media: str = "media",
                   media_type: str = "media_type",
                   id_col: str = "doc_id") -> DataFrame:
    """Typed metadata per media object, Arrow-batched.  Corrupt objects
    yield ok=false rows instead of failing the task — at 10^12 objects
    some WILL be corrupt, and a metadata pass must route them, not die."""
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for did, mt, buf in zip(b[id_col], b[media_type], b[media]):
                rec = {"doc_id": int(did), "media_type": mt, "ok": True,
                       "width": None, "height": None, "duration_ms": None,
                       "n_frames": None, "n_keyframes": None,
                       "bitrate_kbps": None, "sample_rate": None}
                try:
                    if mt == "image":
                        p = probe_image(bytes(buf))
                        rec.update(width=p["width"], height=p["height"])
                    elif mt == "audio":
                        p = probe_mp3(bytes(buf))
                        rec.update(duration_ms=p["duration_ms"],
                                   n_frames=p["frames"],
                                   bitrate_kbps=p["bitrate_kbps"],
                                   sample_rate=p["sample_rate"])
                    elif mt == "video":
                        p = probe_h264(bytes(buf))
                        rec.update(width=p["width"], height=p["height"],
                                   n_frames=p["n_slices"],
                                   n_keyframes=p["n_idr"])
                    else:
                        rec["ok"] = False
                except (ValueError, IndexError, struct.error):
                    rec["ok"] = False
                rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=PROBE_SCHEMA)
