"""Tests for the training-data pipeline operators over the driver testdata
(documents/embeddings/events at sf0.001) plus the tiling operator.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geography_spark.core import cellid as C
from s2geography_spark.operators import dedup, similarity, textstats, tiles
from s2geography_spark.operators.multimodal import (extract_media_features,
                                                    frame_sample_plan,
                                                    synthesize_media_df)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_tiles_match_numpy(spark):
    pts = [(-64.0, 45.0), (170.25, -85.5), (0.125, 0.125), (-179.9, 89.9)]
    df = spark.createDataFrame(pts, "lng double, lat double")
    out = tiles.assign_tiles(df, s2_levels=(4, 12), mercator_zooms=(4, 12)).collect()
    for row, (lng, lat) in zip(out, pts):
        leaf = C.from_lnglat(np.array([lng]), np.array([lat]))
        for lev in (4, 12):
            expect = int(C.parent(leaf, lev).view(np.int64)[0])
            assert row[f"s2_cell_l{lev}"] == expect
        for z in (4, 12):
            n = 1 << z
            xx = min(int((lng + 180.0) / 360.0 * n), n - 1)
            latc = max(min(lat, tiles.MAX_MERCATOR_LAT), -tiles.MAX_MERCATOR_LAT)
            lr = math.radians(latc)
            yy = int((1.0 - math.log(math.tan(lr) + 1 / math.cos(lr)) / math.pi) / 2.0 * n)
            yy = max(min(yy, n - 1), 0)
            assert row[f"tile_z{z}_x"] == xx, (z, lng)
            assert row[f"tile_z{z}_y"] == yy, (z, lat)


def test_text_stats(spark, docs):
    out = textstats.with_text_stats(docs.limit(50)).collect()
    for r in out:
        toks = r.text.split()
        assert r.n_tokens == len(toks)
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0
    # fingerprint is whitespace/case insensitive
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "text string")
    fps = df.select(textstats.fingerprint("text").alias("f")).collect()
    assert fps[0].f == fps[1].f


def test_lang_id(spark):
    df = spark.createDataFrame([
        ("the cat sat on the mat and it is fine",),
        ("der hund ist nicht auf der couch und das ist gut",),
        ("le chat est dans la maison pour la nuit",),
        ("xyzzy qwerty",),
    ], "text string")
    out = df.select(textstats.lang_id("text").alias("l")).collect()
    assert [r.l for r in out] == ["en", "de", "fr", "und"]


def test_exact_dedup(spark):
    rows = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma"), (4, "alpha beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = dedup.exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2, 4] and groups[0].keep_id == 1
    kept = dedup.dedup_exact(df).select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [1, 3]
    # max_ids caps the per-group id list (smallest ids) while n_docs stays
    # the true count — the aggregation buffer is bounded before collect
    capped = dedup.exact_duplicate_groups(df, max_ids=2).collect()
    assert capped[0].doc_ids == [1, 2]
    assert capped[0].n_docs == 3 and capped[0].keep_id == 1


def _jaccard(a, b, n=3):
    def sh(t):
        toks = "".join(ch if (ch.isalnum() or ch.isspace()) else "" for ch in t.lower()).split()
        return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / max(len(sa | sb), 1)


def test_ngram_jaccard_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river shore"),
        (3, "completely different text about spark query engines and optimizers"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a, r.b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(df, threshold=0.3).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs
    assert pairs[(1, 2)] == pytest.approx(_jaccard(rows[0][1], rows[1][1]), abs=1e-12)
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dups(spark, docs):
    # plant two near-duplicates of an existing doc
    base = docs.limit(1).collect()[0]
    near = base.text + " extra tail token"
    df = docs.limit(100).select("doc_id", "text").union(
        docs.sparkSession.createDataFrame(
            [(100001, base.text), (100002, near)], "doc_id long, text string"))
    pairs = {(r.a, r.b) for r in dedup.minhash_lsh_pairs(df, threshold=0.5).collect()}
    assert (base.doc_id, 100001) in pairs
    assert (base.doc_id, 100002) in pairs or (100001, 100002) in pairs


def test_simhash_near_pairs(spark):
    # long repetitive docs: one changed token flips ~1 signature bit, so the
    # 4-band pigeonhole (guaranteed recall for hamming <= 3) finds the pair
    base = " ".join(f"token{i % 17} word{i % 23}" for i in range(40))
    variant = base.replace("token3 word3", "token3 wordX", 1)
    rows = [(1, base), (2, variant),
            (3, "unrelated content entirely about cooking pasta with tomatoes")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a, r.b): r.hamming
             for r in dedup.simhash_near_pairs(df, max_hamming=3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_sig_pairs_worst_case_recall(spark):
    # hamming-3 pairs with the 3 flipped bits landing in 3 DIFFERENT blocks
    # (the worst case for the block-combination scheme: only C(3,3)=1 of the
    # 20 combos matches) must still be found — pigeonhole guarantees it
    base = 0x123456789ABCDEF0
    flipped = base ^ (1 << 2) ^ (1 << 20) ^ (1 << 50)  # blocks 0, 1, 4
    far = base ^ 0xFF  # hamming 8 > 3
    df = spark.createDataFrame([(base,), (flipped,), (far,)], "sim long")
    got = {(r.sim_a, r.sim_b, r.hamming)
           for r in dedup.simhash_sig_pairs(df, max_hamming=3).collect()}
    lo, hi = sorted([base, flipped])
    assert (lo, hi, 3) in got
    assert all(h <= 3 for _, _, h in got)


def test_simhash_identical_corpus_no_candidate_explosion(spark):
    # 10^4 identical documents collapse to ONE distinct signature before the
    # banded join: its input is C(6,3)=20 key rows, not 4 * N as in the old
    # per-document 16-bit-band plan (where this corpus put 10^4 rows in one
    # bucket -> ~5*10^7 pre-refine candidates)
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page body repeated verbatim").alias("text"))
    sh = docs.select(dedup.simhash_udf()(F.col("text")).alias("sim")).distinct()
    assert sh.count() == 1
    keyed = sh.select(F.explode(
        dedup._simhash_combo_keys(F.col("sim"), 6, 3)).alias("_k"))
    assert keyed.count() == 20
    # and the id-pair expansion still yields every same-signature pair
    pairs = dedup.simhash_near_pairs(docs.limit(200), max_hamming=3)
    assert pairs.count() == 200 * 199 // 2


def test_brute_force_topk_exact(spark, emb):
    corpus = emb.limit(300)
    queries = (emb.limit(5)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    got = similarity.brute_force_topk(corpus, queries, k=3).collect()
    # numpy oracle
    cps = corpus.collect()
    M = np.array([r.embedding for r in cps], dtype=np.float64)
    ids = np.array([r.vec_id for r in cps])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in queries.collect():
        v = np.array(q.q_vec, dtype=np.float64)
        v = v / np.linalg.norm(v)
        cos = Mn @ v
        order = np.lexsort((ids, -cos))[:3]
        expect = ids[order].tolist()
        mine = [r.vec_id for r in sorted(
            (r for r in got if r.q_id == q.q_id), key=lambda r: r.rank)]
        assert mine == expect


def test_ivf_topk_full_probe_is_exact(spark, emb):
    # probing ALL lists makes IVF exact: it must equal brute force
    corpus = emb.limit(300)
    queries = (emb.limit(5)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    dim = len(corpus.first().embedding)
    cents = (emb.where(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    exact = {(r.q_id, r.rank): r.vec_id for r in
             similarity.brute_force_topk(corpus, queries, k=3).collect()}
    ivf = {(r.q_id, r.rank): r.vec_id for r in
           similarity.ivf_topk(corpus, queries, k=3, centroids=cents,
                               dim=dim, nprobe=8).collect()}
    assert ivf == exact


def test_ivf_topk_probe_subset_and_self_recall(spark, emb):
    corpus = emb.limit(400)
    queries = (corpus.limit(20)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    dim = len(corpus.first().embedding)
    cents = (emb.where(F.col("vec_id") < 16)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    got = similarity.ivf_topk(corpus, queries, k=1, centroids=cents,
                              dim=dim, nprobe=1).collect()
    # nprobe=1 still finds the query itself: a vector's own nearest list
    # is by definition the one the corpus copy was assigned to
    top1 = {r.q_id: r.vec_id for r in got if r.rank == 1}
    assert sum(1 for q, v in top1.items() if q == v) == 20
    # a probed-subset search returns at most k rows per query and only
    # candidates from probed lists (sanity: row count bounded)
    assert len(got) == 20


def test_lsh_topk_self_recall(spark, emb):
    corpus = emb.limit(400)
    queries = (corpus.limit(20)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    dim = len(corpus.first().embedding)
    got = similarity.lsh_topk(corpus, queries, k=1, dim=dim,
                              bands=4, planes_per_band=8).collect()
    # each query vector must find itself (same bucket, cosine 1)
    top1 = {r.q_id: r.vec_id for r in got if r.rank == 1}
    hits = sum(1 for q, v in top1.items() if q == v)
    assert hits == 20


def test_banded_lsh_recall_beats_single_band(spark):
    # planted epsilon-perturbed (NOT identical) near-dup pairs: the round-2
    # single-band scheme (== bands=1) misses every pair where any one of its
    # sign bits flips; OR-amplification (match ANY of 8 bands) recovers them
    dim = 64
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pert = base + 0.01 * rng.standard_normal((40, dim))
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    rows = [(i, base[i].astype(float).tolist()) for i in range(40)] + \
           [(i + 1000, pert[i].astype(float).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    true_pairs = {(i, i + 1000) for i in range(40)
                  if float(base[i] @ pert[i]) >= 0.99}
    assert len(true_pairs) >= 20  # the perturbation keeps most pairs above
    single = {(r.a, r.b) for r in similarity.embedding_near_duplicates(
        df, dim, threshold=0.99, bands=1, planes_per_band=16).collect()}
    banded = {(r.a, r.b) for r in similarity.embedding_near_duplicates(
        df, dim, threshold=0.99, bands=8, planes_per_band=16).collect()}
    # single-band must demonstrably miss some true pairs; banded finds all
    assert true_pairs - single, "single-band unexpectedly found everything"
    assert true_pairs <= banded


def test_lsh_hot_bucket_cap(spark):
    # a degenerate corpus (one embedding repeated) with max_bucket set must
    # not emit the quadratic candidate set
    dim = 8
    v = [1.0] * dim
    rows = [(i, v) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_near_duplicates(
        df, dim, threshold=0.999, max_bucket=50)
    assert out.count() == 0  # every band bucket is hot -> capped away


def test_embedding_near_duplicates(spark, emb):
    dim = len(emb.first().embedding)
    base = emb.limit(50)
    clone = base.select((F.col("vec_id") + 1000000).alias("vec_id"),
                        "embedding", "label")
    df = base.union(clone)
    pairs = {(r.a, r.b) for r in similarity.embedding_near_duplicates(
        df, dim, threshold=0.999).collect()}
    for r in base.collect():
        assert (r.vec_id, r.vec_id + 1000000) in pairs


def test_multimodal_plumbing(spark):
    media = synthesize_media_df(spark, 60)
    feats = extract_media_features(media).collect()
    assert len(feats) == 60
    assert all(r.ok and len(r.feat) == 8 for r in feats)
    # deterministic across runs
    again = {r.id: r.feat for r in extract_media_features(media).collect()}
    for r in feats:
        assert again[r.id] == r.feat
    frames = frame_sample_plan(media, every_ms=1000)
    vids = media.where(F.col("meta.media_type") == "video").count()
    assert frames.select("id").distinct().count() == vids


def test_hex_tiles(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 45.0), (1, 10.0001, 45.0001),   # ~10 m apart
         (2, 10.0, 45.0), (3, 30.0, -20.0)],
        "pid long, lng double, lat double")
    out = tiles.assign_tiles(df, s2_levels=(), mercator_zooms=(),
                             hex_resolutions=(6,))
    rows = {r.pid: r.hex_r6 for r in out.collect()}
    assert rows[0] == rows[2]                 # identical points same hex
    assert rows[0] == rows[1]                 # 10 m apart, ~10 km hexes
    assert rows[0] != rows[3]                 # far away differs
    # determinism + resolution separation
    out2 = {r.pid: r.hex_r6 for r in tiles.assign_tiles(
        df, s2_levels=(), mercator_zooms=(), hex_resolutions=(6,)).collect()}
    assert out2 == rows
    fine = tiles.assign_tiles(df, s2_levels=(), mercator_zooms=(),
                              hex_resolutions=(12,)).collect()
    assert all(r.hex_r12 is not None for r in fine)


def test_multimodal_real_codecs(spark):
    import numpy as np
    from s2geography_spark.operators import multimodal as M
    # PPM round-trip
    img = M._synth_image(7, 20, 14)
    assert (M.decode_ppm(M.encode_ppm(img)) == img).all()
    # WAV round-trip
    wave = (np.sin(np.arange(800) * 0.02) * 9000).astype(np.int16)
    s, rate = M.decode_wav(M.encode_wav(wave, 16000))
    assert rate == 16000 and (s == wave).all()
    # video container round-trip
    frames = [M._synth_image(i, 8, 6) for i in range(3)]
    dec = M.decode_video(M.encode_video(frames))
    assert len(dec) == 3 and all((a == b).all() for a, b in zip(dec, frames))
    # unsupported codecs hit the seam
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        M.decode_ppm(b"\x89PNG....")
    with _pt.raises(NotImplementedError):
        M.decode_wav(b"ID3....mp3data")


def test_multimodal_resize_and_frames(spark):
    from s2geography_spark.operators import multimodal as M
    media = synthesize_media_df(spark, 30).cache()
    # resize: every image row becomes 8x8 PPM; non-images null
    res = {r.id: r.resized for r in M.resize_images(media, 8, 8).collect()}
    metas = {r.id: r.meta for r in media.collect()}
    for i, m in metas.items():
        if m.media_type == "image":
            img = M.decode_image(bytes(res[i]))
            assert img.shape == (8, 8, 3)
        else:
            assert res[i] is None
    # real frame sampling: one row per frame, decodable frames
    fr = M.sample_video_frames(media, every=1).collect()
    n_expected = sum(2 + i % 5 for i in range(30) if i % 3 == 2)
    assert len(fr) == n_expected
    f0 = M.decode_ppm(bytes(fr[0].frame))
    assert f0.shape == (12, 16, 3)
    # feature extraction: image features carry true dimensions
    feats = {r.id: r.feat for r in extract_media_features(media).collect()}
    for i, m in metas.items():
        if m.media_type == "image":
            assert feats[i][4] == m.width and feats[i][5] == m.height


def test_png_codec_roundtrip_and_pipeline(spark):
    """Round-3 real PNG codec (stdlib zlib): RGB/gray/RGBA roundtrips, and
    the media pipeline decodes PNG rows (synth corpus alternates PPM/PNG)."""
    from s2geography_spark.operators.multimodal import (decode_image,
                                                        decode_png,
                                                        encode_png,
                                                        _synth_image)
    img = _synth_image(11, 29, 17)
    assert (decode_png(encode_png(img)) == img).all()
    gray = img[:, :, 1]
    assert (decode_png(encode_png(gray)) == gray).all()
    rgba = np.dstack([img, gray])
    assert (decode_png(encode_png(rgba)) == rgba).all()
    assert (decode_image(encode_png(img)) == img).all()
    # unsupported mode stays a clearly-marked seam (16-bit decodes natively
    # since round 4; Adam7 interlace remains the external-lib boundary)
    import pytest as _pytest
    import struct as _struct, zlib as _zlib
    from s2geography_spark.operators.multimodal import _PNG_SIG, _png_chunk
    ihdr_i = _struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr_i)
    with _pytest.raises(NotImplementedError):
        decode_png(bad)
    # the media feature pipeline handles image/png rows end-to-end
    media = synthesize_media_df(spark, 24)
    png_ids = {r.id for r in media.where(
        F.col("meta.codec") == "image/png").select("id").collect()}
    assert png_ids, "synth corpus should contain PNG rows"
    feats = {r.id: r for r in extract_media_features(media).collect()}
    assert all(feats[i].ok for i in png_ids)


def test_png_extended_color_modes(spark):
    """Round-4 PNG decoder extensions: PLTE-indexed (with tRNS -> RGBA),
    sub-byte gray, 16-bit samples, gray+alpha — plus resize_images over a
    palette PNG (the Common-Crawl sample shape the round-3 verdict named)."""
    import struct, zlib
    from s2geography_spark.operators import multimodal as M
    from s2geography_spark.operators.multimodal import (_PNG_SIG, _png_chunk,
                                                        decode_png)

    def make_png(w, h, depth, ctype, scan_bytes, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in scan_bytes)
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + extra
                + _png_chunk(b"IDAT", zlib.compress(raw))
                + _png_chunk(b"IEND", b""))

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    png_pal = make_png(4, 2, 8, 3, [idx[0].tobytes(), idx[1].tobytes()],
                       _png_chunk(b"PLTE", pal.tobytes())
                       + _png_chunk(b"tRNS", bytes([255, 128, 0])))
    img = decode_png(png_pal)
    assert img.shape == (2, 4, 4)
    assert (img[0, 1] == [0, 255, 0, 128]).all()
    assert (img[0, 2] == [0, 0, 255, 0]).all()
    # 4-bit palette with scanline bit padding
    rows4 = [bytes([(r[0] << 4) | r[1], r[2] << 4]) for r in [[0, 1, 2], [2, 1, 0]]]
    img4 = decode_png(make_png(3, 2, 4, 3, rows4,
                               _png_chunk(b"PLTE", pal.tobytes())))
    assert (img4[0] == pal[[0, 1, 2]]).all() and (img4[1] == pal[[2, 1, 0]]).all()
    # 16-bit gray downscales to the high byte
    g16 = np.array([[0x1234, 0xFFEE], [0x0001, 0x8000]], dtype=">u2")
    img16 = decode_png(make_png(2, 2, 16, 0, [g16[0].tobytes(), g16[1].tobytes()]))
    assert (img16 == [[0x12, 0xFF], [0x00, 0x80]]).all()
    # 2-bit gray scales to full range
    assert (decode_png(make_png(4, 1, 2, 0, [bytes([0b00011011])]))
            == [[0, 85, 170, 255]]).all()
    # gray+alpha
    ga = np.array([[[10, 200], [20, 100]]], dtype=np.uint8)
    assert (decode_png(make_png(2, 1, 8, 4, [ga[0].tobytes()])) == ga).all()
    # resize pipeline consumes a palette PNG end-to-end
    media = spark.createDataFrame([(0, bytearray(png_pal))], "id long, media binary") \
        .withColumn("meta", F.struct(F.lit("image").alias("media_type"),
                                     F.lit(4).alias("width"),
                                     F.lit(2).alias("height")))
    res = M.resize_images(media, 8, 8).collect()
    out = M.decode_image(bytes(res[0].resized))
    assert out.shape[:2] == (8, 8)


def test_jpeg_codec_roundtrip():
    """Baseline JPEG (operators/jpeg.py): solid-gray images decode EXACTLY
    (DC-only blocks), gradients within quantization error, color 4:2:0 and
    restart intervals reproduce the no-restart decode bit-identically,
    partial MCUs crop correctly, progressive raises the seam."""
    import numpy as np
    import pytest
    from s2geography_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from s2geography_spark.operators.multimodal import decode_image

    solid = np.full((24, 17), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(solid))
    assert out.shape == (24, 17) and (out == 200).all()

    yy, xx = np.meshgrid(np.arange(48), np.arange(56), indexing="ij")
    # smooth (non-wrapping) ramp: error bounded by quantization, no ringing
    gray = ((xx * 3 + yy * 2) * 255 // (55 * 3 + 47 * 2)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(gray))
    assert np.abs(dg.astype(int) - gray.astype(int)).max() <= 4

    color = np.dstack([((xx * 2 + yy) % 256), ((yy * 3) % 256),
                       ((xx + yy) % 256)]).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(color))
    assert base.shape == color.shape
    for ri in (1, 3):
        assert (decode_jpeg(encode_jpeg(color, restart_interval=ri))
                == base).all()
    for shape in [(9, 13), (17, 31)]:
        g = ((np.arange(shape[0])[:, None] * 7
              + np.arange(shape[1])[None, :] * 3) % 256).astype(np.uint8)
        assert decode_jpeg(encode_jpeg(g)).shape == shape

    # decode_image dispatches on the SOI magic
    assert (decode_image(encode_jpeg(solid)) == 200).all()

    # progressive (SOF2) is the documented external-library seam
    buf = bytearray(encode_jpeg(solid))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))


def test_jpeg_rows_flow_through_media_pipeline(spark):
    """synthesize_media_df now rotates JPEG in; features and resize must
    treat those rows as first-class decodable images."""
    from s2geography_spark.operators import multimodal as M
    media = M.synthesize_media_df(spark, 36).cache()
    jpeg_ids = {r.id for r in media.where(
        F.col("meta.codec") == "image/jpeg").select("id").collect()}
    assert jpeg_ids, "synth corpus should contain JPEG rows"
    feats = {r.id: r for r in M.extract_media_features(media).collect()}
    assert all(feats[i].ok for i in jpeg_ids)
    res = {r.id: r.resized for r in M.resize_images(media, 8, 8).collect()}
    for i in jpeg_ids:
        assert M.decode_image(bytes(res[i])).shape == (8, 8, 3)
    media.unpersist()


def test_wav_8bit_pcm_decode():
    import numpy as np
    import struct as _s
    from s2geography_spark.operators.multimodal import decode_wav
    data = (np.arange(256) % 256).astype(np.uint8).tobytes()
    hdr = _s.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
                  b"fmt ", 16, 1, 1, 8000, 8000, 1, 8, b"data", len(data))
    s, rate = decode_wav(hdr + data)
    assert rate == 8000 and len(s) == 256
    assert s[128] == 0 and s[0] == -32768 and s.dtype == np.int16


def test_repetition_stats_hand_computed(spark):
    docs = [
        (0, "a b c a b c a b c"),
        (1, "the quick brown fox"),
        (2, "x"),
        (3, None),
        (4, "line one\nline one\nline two\n\n- bullet\nend..."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x.doc_id: x for x in textstats.with_repetition_stats(df).collect()}
    # doc 0: 9 words, 3 distinct; "a b" x3 covers 9 of 17 chars,
    # "a b c" x3 covers 15 of 17
    assert r[0].dup_word_frac == pytest.approx(6 / 9)
    assert r[0].top_word_frac == pytest.approx(3 / 9)
    assert r[0].top_bigram_char_frac == pytest.approx(9 / 17)
    assert r[0].top_trigram_char_frac == pytest.approx(15 / 17)
    # doc 1: all distinct; max bigram coverage is len("quick brown")=11
    assert r[1].dup_word_frac == 0.0
    assert r[1].top_bigram_char_frac == pytest.approx(11 / 19)
    # doc 2: one word -> no n-grams
    assert r[2].top_bigram_char_frac is None
    assert r[2].top_trigram_char_frac is None
    # doc 3: null text behaves as empty
    assert r[3].dup_word_frac == 0.0 and r[3].top_word_frac == 0.0
    # doc 4 line metrics: 5 non-blank lines, one repeated ("line one",
    # 8 chars of 38), one ellipsis line, one bullet line
    assert r[4].dup_line_frac == pytest.approx(1 / 5)
    assert r[4].dup_line_char_frac == pytest.approx(8 / 38)
    assert r[4].ellipsis_line_frac == pytest.approx(1 / 5)
    assert r[4].bullet_line_frac == pytest.approx(1 / 5)
    # all docs are under the 50-word gate -> repetition_pass everywhere
    assert all(r[i].repetition_pass for i in r)


def test_repetition_gopher_gate(spark):
    # 60 words of the same bigram loop -> fails top_bigram threshold;
    # 60 distinct words -> passes
    spam = " ".join(["buy now"] * 30)
    ok = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame([(0, spam), (1, ok)],
                               "doc_id long, text string")
    r = {x.doc_id: x for x in textstats.with_repetition_stats(df).collect()}
    assert not r[0].repetition_pass
    # "buy now" x30 covers 30*7 of the 239 chars
    assert r[0].top_bigram_char_frac == pytest.approx(210 / 239)
    assert r[1].repetition_pass


def test_url_canonicalization(spark):
    from s2geography_spark.operators import webtext
    cases = [
        # (raw, expected canonical)
        (0, "https://Example.COM/a/b?x=1", "https://example.com/a/b?x=1"),
        (1, "HTTPS://WWW.EXAMPLE.COM:443/a/", "https://example.com/a"),
        (2, "http://example.com:80/", "http://example.com/"),
        (3, "http://example.com:8080/a", "http://example.com:8080/a"),
        (4, "https://u:p@example.com/a", "https://example.com/a"),
        (5, "https://example.com/a?b=2&a=1#frag", "https://example.com/a?a=1&b=2"),
        (6, "https://example.com/a?utm_source=x&utm_medium=y",
            "https://example.com/a"),
        (7, "https://example.com/a?fbclid=Z&q=hi&gclid=1&ref=nav",
            "https://example.com/a?q=hi"),
        (8, "https://example.com", "https://example.com/"),
        (9, "not a url at all", "not a url at all"),  # passthrough
        (10, "/relative/path?a=1", "/relative/path?a=1"),  # passthrough
        (11, "https://example.com/refresh?reference=1",
             "https://example.com/refresh?reference=1"),  # no prefix FP
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "id long, url string")
    got = {r.id: r.c for r in
           df.select("id", webtext.canonical_url("url").alias("c")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_registered_domain(spark):
    from s2geography_spark.operators import webtext
    cases = [
        ("example.com", "example.com"),
        ("a.b.example.com", "example.com"),
        ("example.co.uk", "example.co.uk"),
        ("www.sub.example.co.uk", "example.co.uk"),
        ("localhost", "localhost"),
        ("example.gov.br", "example.gov.br"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [r.d for r in
           df.select(webtext.registered_domain("h").alias("d")).collect()]
    assert got == [w for _, w in cases]


def test_url_dedup_groups(spark):
    from s2geography_spark.operators import webtext
    rows = [
        (1, "https://example.com/a?b=2&a=1"),
        (2, "HTTPS://WWW.Example.com:443/a/?a=1&utm_source=s&b=2"),
        (3, "https://example.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    g = {r.canon_url: r for r in webtext.url_dedup_groups(df).collect()}
    assert g["https://example.com/a?a=1&b=2"].n_docs == 2
    assert g["https://example.com/a?a=1&b=2"].keep_id == 1
    assert g["https://example.com/other"].n_docs == 1


def test_html_to_text(spark):
    from s2geography_spark.operators import webtext
    cases = [
        (0, "<p>Hello <b>world</b></p>", "Hello world"),
        (1, "<script>var a = \"<p>no</p>\";</script><p>yes</p>", "yes"),
        (2, "<style>p { x: '<'; }</style>text", "text"),
        (3, "a<br>b<BR/>c", "a\nb\nc"),
        (4, "<!-- <p>hidden</p> -->shown", "shown"),
        (5, "x &amp;amp; y", "x &amp; y"),  # one-pass decode
        (6, "A&nbsp;&lt;tag&gt;&quot;q&quot;&#39;s&#39;", "A <tag>\"q\"'s'"),
        (7, "  lots   of \t spaces  \n\n\n and lines ",
            "lots of spaces\nand lines"),
        (8, "<div>a</div><div>b</div>", "a\nb"),
        (9, "<SCRIPT\nsrc='x'>body</script\n>after", "after"),
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases],
                               "id long, html string")
    got = {r.id: r.t for r in
           df.select("id", webtext.html_to_text("html").alias("t")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, repr(got[i]), repr(want))


def test_connected_components_shapes(spark):
    # a 12-node path (worst case for label propagation, exercises
    # multiple star rounds), a triangle, a pair, and a "bowtie" joined
    # through one shared node
    path = [(i, i + 1) for i in range(100, 111)]
    tri = [(200, 201), (201, 202), (200, 202)]
    pair = [(300, 301)]
    bowtie = [(400, 401), (401, 402), (402, 400),
              (402, 403), (403, 404), (404, 402)]
    edges = spark.createDataFrame(path + tri + pair + bowtie,
                                  "a long, b long")
    got = {r.node: (r.rep, r.cluster_size)
           for r in dedup.dedup_clusters(edges).collect()}
    assert all(got[n] == (100, 12) for n in range(100, 112))
    assert all(got[n] == (200, 3) for n in (200, 201, 202))
    assert got[300] == (300, 2) and got[301] == (300, 2)
    assert all(got[n] == (400, 5) for n in range(400, 405))
    assert len(got) == 22


def test_connected_components_reversed_and_dup_edges(spark):
    # duplicate edges in both orientations must not distort sizes
    edges = spark.createDataFrame(
        [(5, 3), (3, 5), (5, 3), (1, 5)], "a long, b long")
    got = {r.node: (r.rep, r.cluster_size)
           for r in dedup.dedup_clusters(edges).collect()}
    assert got == {1: (1, 3), 3: (1, 3), 5: (1, 3)}


def test_corpus_filter_gates(spark):
    spam = " ".join(["buy now"] * 40)           # fails repetition
    noisy = "!!!" * 5     # fails quality: short AND all punctuation
    # >= 50 words (repetition gates apply), varied vocabulary, heavy
    # English stopwords, low punctuation
    good_en = ("the cat and a dog ran to the old house of a friend "
               "that is known for all with everyone around here "
               + " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12)))
    df = spark.createDataFrame(
        [(0, spam, "en"), (1, noisy, "en"), (2, good_en, "en"),
         (3, good_en, "de")],
        "doc_id long, text string, lang string")
    r = {x.doc_id: x for x in
         textstats.corpus_filter(df, lang_col="lang").collect()}
    assert not r[0].repetition_pass and not r[0].keep
    assert not r[1].quality_pass and not r[1].keep
    assert r[2].repetition_pass and r[2].quality_pass and r[2].lang_match
    assert r[2].keep
    assert not r[3].lang_match and not r[3].keep  # en text, de metadata


def test_cap_per_group(spark):
    from s2geography_spark.operators import webtext
    rows = [("a", 1, 0.9), ("a", 2, 0.5), ("a", 3, 0.9), ("a", 4, 0.1),
            ("b", 5, 0.3)]
    df = spark.createDataFrame(rows, "host string, doc_id long, q double")
    kept = webtext.cap_per_group(
        df, ["host"], [F.col("q").desc(), F.col("doc_id")], k=2,
        rank_col="rn").collect()
    got = {(r.host, r.doc_id): r.rn for r in kept}
    # ties on q break by doc_id: 1 before 3
    assert got == {("a", 1): 1, ("a", 3): 2, ("b", 5): 1}


def _wkb_poly(ring):
    from s2geography_spark.core.geog import Geog, to_wkb
    return bytearray(to_wkb(Geog(polys=[[np.array(ring, dtype=float)]])))


def test_vector_tile_coverage_concave(spark):
    # L-shape: (-40,-40)-(40,40) square minus its NE quadrant.  bbox spans
    # x 3..4 / y 2..5 at zoom 3 (row 2 via the real geodesic bulge of the
    # lat-40 chord); the empty NE bbox corner (4,2) must be refined away.
    L = _wkb_poly([[-40, -40], [40, -40], [40, 0], [0, 0],
                   [0, 40], [-40, 40], [-40, -40]])
    df = spark.createDataFrame([(1, L)], "fid long, geog binary")
    got = {(r.x, r.y) for r in tiles.vector_tile_coverage(df, 3).collect()}
    assert got == {(3, 2), (3, 3), (3, 4), (3, 5), (4, 3), (4, 4), (4, 5)}
    # without the refine the empty corner stays
    raw = {(r.x, r.y)
           for r in tiles.vector_tile_coverage(df, 3, refine=False).collect()}
    assert raw - got == {(4, 2)}


def test_vector_tile_coverage_antimeridian(spark):
    # box crossing the antimeridian: xmin > xmax splits into two x-runs
    df = spark.createDataFrame(
        [(1, _wkb_poly([[170, -5], [-170, -5], [-170, 5],
                        [170, 5], [170, -5]]))], "fid long, geog binary")
    got = {(r.x, r.y) for r in tiles.vector_tile_coverage(df, 3).collect()}
    # zoom 3: lng 170..180 -> x 7; -180..-170 -> x 0; lat +-5 -> y 3,4
    assert got == {(7, 3), (7, 4), (0, 3), (0, 4)}


def test_vector_tile_coverage_bbox_columns_and_guard(spark):
    # explicit ingest bbox columns: candidate stage stays pure-Column
    df = spark.createDataFrame(
        [(1, _wkb_poly([[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]]),
          10.0, 10.0, 20.0, 20.0)],
        "fid long, geog binary, xmin double, ymin double, "
        "xmax double, ymax double")
    got = tiles.vector_tile_coverage(
        df, 6, bbox=("xmin", "ymin", "xmax", "ymax")).count()
    assert got > 0
    # planet-wide feature at high zoom must fail loudly, not silently cap
    world = spark.createDataFrame(
        [(1, _wkb_poly([[-179, -80], [179, -80], [179, 80],
                        [-179, 80], [-179, -80]]),
          -179.0, -80.0, 179.0, 80.0)],
        "fid long, geog binary, xmin double, ymin double, "
        "xmax double, ymax double")
    with pytest.raises(Exception, match="vector_tile_coverage"):
        tiles.vector_tile_coverage(
            world, 12, bbox=("xmin", "ymin", "xmax", "ymax"),
            refine=False).count()
