"""Container/metadata probes: MP3 frame walk, H.264 NAL/SPS, image
headers, and the Spark mapInPandas surface."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geography_spark.operators import mediaprobe as MP
from s2geography_spark.operators import multimodal as MM


def test_mp3_probe_cbr_with_id3():
    b = MP.make_mp3(50, kbps=64, rate=22050, id3=b"TAGDATA" * 40)
    p = MP.probe_mp3(b)
    assert p["frames"] == 50
    assert p["sample_rate"] == 22050
    assert p["bitrate_kbps"] == 64 and not p["vbr"]
    assert p["duration_ms"] == round(50 * 576 * 1000 / 22050)


def test_mp3_probe_vbr_and_trailing_garbage():
    b = (MP.make_mp3(3, kbps=32, rate=16000)
         + MP.make_mp3(2, kbps=64, rate=16000) + b"TAG" + b"\x01" * 40)
    p = MP.probe_mp3(b)
    assert p["frames"] == 5 and p["vbr"]
    assert p["bitrate_kbps"] == round((3 * 32 + 2 * 64) / 5)


def test_mp3_probe_rejects_non_audio():
    with pytest.raises(ValueError):
        MP.probe_mp3(b"\x00" * 64)


def test_sps_roundtrip_and_cropping():
    for w, h in [(64, 48), (1920, 1088), (256, 160)]:
        assert MP.parse_sps(MP.make_sps(w, h)) \
            == {"profile_idc": 66, "level_idc": 30, "width": w,
                "height": h, "frame_mbs_only": True}
    # hand-written HIGH-profile SPS with 4:2:0 cropping: 1920x1080 is
    # 120x68 MBs cropped by 4 luma rows at the bottom (crop_b=2, unit 2)
    w = MP._BitWriter()
    w.u(100, 8)     # profile high
    w.u(0, 8)
    w.u(40, 8)      # level 4.0
    w.ue(0)         # sps id
    w.ue(1)         # chroma_format_idc 4:2:0
    w.ue(0)         # bit_depth_luma_minus8
    w.ue(0)         # bit_depth_chroma_minus8
    w.u(0, 1)       # qpprime
    w.u(0, 1)       # no scaling matrix
    w.ue(0)         # log2_max_frame_num_minus4
    w.ue(0)         # poc type 0
    w.ue(0)         # log2_max_poc_lsb_minus4
    w.ue(4)         # max refs
    w.u(0, 1)
    w.ue(119)       # 120 MBs wide
    w.ue(67)        # 68 MB rows
    w.u(1, 1)       # frame_mbs_only
    w.u(1, 1)       # direct_8x8
    w.u(1, 1)       # frame_cropping_flag
    w.ue(0); w.ue(0); w.ue(0); w.ue(4)   # crop bottom 4*2=8 luma rows
    w.u(0, 1)       # no VUI
    d = MP.parse_sps(w.bytes_aligned())
    assert (d["width"], d["height"], d["profile_idc"]) == (1920, 1080, 100)


def test_emulation_prevention_strip():
    assert MP._strip_emulation(b"\x00\x00\x03\x01\x00\x00\x03\x00") \
        == b"\x00\x00\x01\x00\x00\x00"


def test_h264_probe_counts_and_keyframes():
    v = MP.make_h264(128, 96, 5, frames_per_gop=4)
    p = MP.probe_h264(v)
    assert p["width"] == 128 and p["height"] == 96
    assert p["n_idr"] == 5 and p["n_slices"] == 20 and p["n_sps"] == 1
    offs = p["keyframe_offsets"]
    assert len(offs) == 5 and all(v[o] & 0x1F == 5 for o in offs)
    # keyframe offsets let a sharder cut the stream WITHOUT decode:
    # every shard re-probes to the same dims using the same SPS prefix
    head = v[:offs[1] - 4]
    assert MP.probe_h264(head)["n_idr"] == 1
    with pytest.raises(ValueError):
        MP.probe_h264(b"\x00\x00\x01" + bytes([0x41]) + b"\x10" * 4)  # no SPS


def test_image_probe_all_formats():
    img = (np.arange(8 * 12 * 3, dtype=np.uint8).reshape(8, 12, 3)) % 255
    assert MP.probe_image(MM.encode_png(img)) \
        == {"format": "png", "width": 12, "height": 8, "channels": 3}
    assert MP.probe_image(MM.encode_ppm(img))["format"] == "ppm"
    from s2geography_spark.operators.jpeg import encode_jpeg
    p = MP.probe_image(encode_jpeg(np.full((16, 24), 128, np.uint8)))
    assert (p["width"], p["height"], p["format"]) == (24, 16, "jpeg")
    with pytest.raises(ValueError):
        MP.probe_image(b"GIF89a......")


def test_probe_media_df(spark):
    rows = [
        (1, "image", bytearray(MM.encode_png(np.zeros((8, 16, 3), np.uint8)))),
        (2, "audio", bytearray(MP.make_mp3(20, kbps=64, rate=22050))),
        (3, "video", bytearray(MP.make_h264(64, 48, 2, frames_per_gop=3))),
        (4, "audio", bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, media binary")
    out = {r["doc_id"]: r.asDict()
           for r in MP.probe_media_df(df).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 8 and out[1]["ok"]
    assert out[2]["n_frames"] == 20 and out[2]["sample_rate"] == 22050
    assert out[3]["n_keyframes"] == 2 and out[3]["n_frames"] == 6
    assert out[3]["width"] == 64
    assert out[4]["ok"] is False and out[4]["width"] is None
