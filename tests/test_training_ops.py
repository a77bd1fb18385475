"""Training-data ops: dedup, similarity, text stats, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from kgpipe.dedup import (
    MINHASH_P, MINHASH_PARAMS, exact_duplicates, jaccard_pairs,
    minhash_lsh_pairs, minhash_signatures, shingles, simhash,
)
from kgpipe.multimodal import extract_features, frame_sample_plan, synthetic_media
from kgpipe.similarity import cosine_topk, lsh_bucket, with_norm
from kgpipe.textstats import (
    build_token_ids, fingerprint, predict_language, quality_score,
    sessionize, token_stats,
)


def _docs(spark):
    rows = [
        (0, "a b c d e"),
        (1, "a b c d e"),          # exact dup of 0
        (2, "a b c d x"),          # near dup of 0
        (3, "z y x w v u t"),
        (4, "a b"),                # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    out = exact_duplicates(_docs(spark)).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 0 and out[0]["n_dups"] == 2


def test_shingles_and_jaccard(spark):
    sh = shingles(_docs(spark), n=3)
    by_doc = {r["doc_id"] for r in sh.collect()}
    assert by_doc == {0, 1, 2, 3, 4}
    # doc0: shingles {abc, bcd, cde}; doc2: {abc, bcd, cdx} → J = 2/4
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in jaccard_pairs(_docs(spark), n=3, threshold=0.1,
                                    max_df=10).collect()}
    assert pairs[(0, 1)] == 1.0
    assert abs(pairs[(0, 2)] - 0.5) < 1e-9


def test_minhash_identical_docs_share_all_bands(spark):
    docs = _docs(spark)
    ids = build_token_ids(docs).select("token", "token_id")
    sig = {r["doc_id"]: r for r in minhash_signatures(docs, ids).collect()}
    for b in range(4):
        assert sig[0][f"band_{b}"] == sig[1][f"band_{b}"]
    # hand-check minh_0 for doc 3 tokens
    tok_ids = {r["token"]: r["token_id"]
               for r in build_token_ids(docs).collect()}
    a, b0 = MINHASH_PARAMS[0]
    expect = min((tok_ids[t] * a + b0) % MINHASH_P for t in "zyxwvut")
    assert sig[3]["minh_0"] == expect
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, ids).collect()}
    assert (0, 1) in pairs


def test_simhash_identical_and_distinct(spark):
    docs = _docs(spark)
    ids = build_token_ids(docs).select("token", "token_id")
    s = {r["doc_id"]: r["simhash"] for r in simhash(docs, ids).collect()}
    assert s[0] == s[1]
    assert s[0] != s[3]
    assert all(0 <= v < 2 ** 16 for v in s.values())


def test_token_stats_and_quality(spark):
    st = {r["doc_id"]: r for r in token_stats(_docs(spark)).collect()}
    assert st[0]["n_tokens"] == 5 and st[0]["n_distinct"] == 5
    assert st[0]["avg_token_len"] == 1.0
    q = {r["doc_id"]: r for r in quality_score(_docs(spark)).collect()}
    assert q[0]["stopword_ratio"] == 0.2  # only "a"
    assert q[3]["stopword_ratio"] == 0.0


def test_predict_language_deterministic_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, "the cat sat", "en"), (1, "der hund und katze", "de"),
         (2, "nohit words only", "zh")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r["pred_lang"]
           for r in predict_language(docs).collect()}
    assert out[0] == "en" and out[1] == "de"
    assert out[2] == "de"  # zero hits everywhere → lexicographically first


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b a")], "doc_id long, text string"
    )
    ids = build_token_ids(docs).select("token", "token_id")
    fp = {r["doc_id"]: r["fingerprint"]
          for r in fingerprint(docs, ids).collect()}
    assert fp[0] != fp[1]


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.01]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(1, 3), (2, 1)]
    norms = {r["vec_id"]: r["l2_norm"] for r in with_norm(emb).collect()}
    assert norms[0] == 1.0
    # embeddings are float32 on disk → compare at float32 precision
    assert abs(norms[1] - math.hypot(0.9, 0.1)) < 1e-5


def test_lsh_bucket_shape(spark):
    rows = [(i, [float(i % 3) - 1.0, float(i % 5) - 2.0, 0.5]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = lsh_bucket(emb, n_planes=4).collect()
    assert len(b) == 20
    assert all(0 <= r["bucket"] < 16 for r in b)


def test_multimodal_features_and_frames(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(-1.0 <= x < 1.0 for r in feats for x in r["feature"])
    # deterministic: same payload → same digest
    again = {r["media_id"]: r["digest"]
             for r in extract_features(media, dim=8).collect()}
    for r in feats:
        assert again[r["media_id"]] == r["digest"]
    frames = frame_sample_plan(media, every_ms=500)
    per_video = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 2 for r in per_video)  # 0ms + 500ms of 1000ms


def test_sessionize(spark):
    from datetime import datetime, timedelta

    base = datetime(2026, 1, 1)
    rows = [
        (1, 100, base), (2, 100, base + timedelta(minutes=5)),
        (3, 100, base + timedelta(minutes=90)),  # gap > 30m → new session
        (4, 200, base),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["user_id"]: r["n_sessions"] for r in sessionize(ev).collect()}
    assert out[100] == 2 and out[200] == 1


def test_exact_duplicates_forced_collision(spark):
    """A deliberately-colliding digest (text length) cannot merge
    different documents: the pass-2 raw-text verification splits the
    colliding digest group back apart."""
    rows = [
        (0, "a b c"),
        (1, "a b c"),   # true dup of 0
        (2, "x y z"),   # same LENGTH as 0/1 → digest collision
        (3, "p q r"),   # same LENGTH too
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_duplicates(docs, digest=lambda c: F.length(c)).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 0 and out[0]["n_dups"] == 2
    # full-inventory mode: every doc appears exactly once, collision
    # victims as their own n_dups=1 groups
    full = exact_duplicates(docs, digest=lambda c: F.length(c),
                            include_singletons=True).collect()
    assert sorted((r["keep_id"], r["n_dups"]) for r in full) == \
        [(0, 2), (2, 1), (3, 1)]
    # default digest (xxhash64) agrees with the plain group-by plan
    d1 = exact_duplicates(docs).collect()
    assert [(r["keep_id"], r["n_dups"]) for r in d1] == [(0, 2)]


def test_exact_duplicates_include_singletons_counts(spark):
    docs = _docs(spark)
    full = exact_duplicates(docs, include_singletons=True)
    rows = full.collect()
    # every doc accounted for exactly once across groups
    assert sum(r["n_dups"] for r in rows) == docs.count()
    assert {r["keep_id"] for r in rows} == {0, 2, 3, 4}


def test_jaccard_max_df_corpus_relative(spark):
    """An absolute max_df cap silently empties the candidate set when
    every shared shingle is 'too common'; the corpus-relative cap
    (max_df_frac) tracks corpus size and keeps recall."""
    rows = [(i, "a b c d e") for i in range(8)]  # 8 identical docs
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # shared shingles have df=8 > 3 → absolute cap finds NOTHING
    assert jaccard_pairs(docs, n=3, threshold=0.5, max_df=3).count() == 0
    # relative cap: max_df = ceil(1.0 * 8) = 8 → all 28 pairs, J = 1.0
    rel = jaccard_pairs(docs, n=3, threshold=0.5, max_df_frac=1.0).collect()
    assert len(rel) == 28
    assert all(r["jaccard"] == 1.0 for r in rel)


def _clustered_embeddings(spark, n_pairs=30, dim=8, noise=0.55):
    """Deterministic near-duplicate pairs: base vector + perturbed copy
    (cosine ≈ 0.85-0.95) — each vector's true nearest neighbor is its
    partner."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(n_pairs):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        pert = base + noise * rng.randn(dim) * 0.35
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in pert]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_multitable_recall_beats_single_table(spark):
    """Banded multi-table LSH (4 tables × 2 planes) must recover a
    larger fraction of true nearest-neighbor pairs than one 8-plane
    table at the SAME total plane budget — the recall fix the single
    table lacks (a near pair must agree on all 8 bits vs any table's 2)."""
    from kgpipe.similarity import (
        lsh_bucket, lsh_bucket_tables, lsh_candidate_pairs,
        lsh_multitable_pairs,
    )

    emb = _clustered_embeddings(spark)
    # ground truth: each vector's exact top-1 neighbor
    gt = cosine_topk(emb, emb, k=1)
    gt_pairs = {frozenset((r["query_id"], r["neighbor_id"]))
                for r in gt.collect()}
    single = {frozenset((r["a"], r["b"]))
              for r in lsh_candidate_pairs(emb, n_planes=8).collect()}
    multi = {frozenset((r["a"], r["b"]))
             for r in lsh_multitable_pairs(
                 emb, n_tables=4, planes_per_table=2).collect()}
    recall_single = len(gt_pairs & single) / len(gt_pairs)
    recall_multi = len(gt_pairs & multi) / len(gt_pairs)
    assert recall_multi > recall_single
    assert recall_multi >= 0.7
    # consistency: one table of N_PLANES planes IS lsh_bucket
    t0 = {(r["vec_id"], r["bucket"])
          for r in lsh_bucket_tables(emb, n_tables=1,
                                     planes_per_table=8).collect()}
    b0 = {(r["vec_id"], r["bucket"]) for r in lsh_bucket(emb).collect()}
    assert t0 == b0


def test_simhash_pairs_banded(spark):
    """Banded SimHash pairs: identical docs pair at hamming 0; the
    pigeonhole guarantee (bands > max_hamming) means every pair within
    the hamming cap that exists among the brute-force fingerprints is
    found by the banded join."""
    from kgpipe.dedup import simhash_pairs

    docs = _docs(spark)
    ids = build_token_ids(docs).select("token", "token_id")
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_pairs(docs, ids, bands=4, max_hamming=3)
           .collect()}
    assert got.get((0, 1)) == 0  # identical docs
    # brute-force ground truth over the fingerprints
    s = {r["doc_id"]: r["simhash"] for r in simhash(docs, ids).collect()}
    expect = {(a, b): bin(s[a] ^ s[b]).count("1")
              for a in s for b in s if a < b
              and bin(s[a] ^ s[b]).count("1") <= 3}
    assert got == expect


def test_ivf_topk_probe_and_recall(spark):
    """IVF ANN: every returned neighbor must lie in one of the query's
    nprobe nearest cells, ranks are exact cosine inside the candidate
    set, and with nprobe = n_cells (probe everything) IVF must equal
    the brute-force top-k exactly."""
    from kgpipe.similarity import ivf_assign, ivf_centroids, ivf_topk

    emb = _clustered_embeddings(spark)
    cent = ivf_centroids(emb, n_cells=4)
    assert cent.count() == 4
    assign = {r["vec_id"]: r["cell"] for r in
              ivf_assign(emb, cent).collect()}
    assert set(assign) == {r["vec_id"] for r in emb.collect()}

    out = ivf_topk(emb, emb, k=1, n_cells=4, nprobe=4)
    brute = cosine_topk(emb, emb, k=1)
    assert {(r["query_id"], r["neighbor_id"]) for r in out.collect()} == \
        {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}

    # partial probe: candidates restricted to probed cells
    narrow = ivf_topk(emb, emb, k=3, n_cells=4, nprobe=1)
    # the query's single probed cell is its own argmin cell (it is a
    # corpus vector), so every neighbor must share the query's cell
    for r in narrow.collect():
        assert assign[r["neighbor_id"]] == assign[r["query_id"]]


def test_ivf_train_balances_cells_and_lifts_recall(spark):
    """Trained IVF centroids (DataFrame-native Lloyd iterations) must
    beat the deterministic lowest-id seeds on BOTH axes that matter at
    scale: cell balance (a fat cell = a hot partition in the candidate
    equi-join) and recall at fixed probe cost. On the fixture the seed
    quantizer packs 30/60 vectors into one cell with nprobe=1 recall
    0.73; training rebalances (max cell < seed max) and lifts recall
    ≥ 0.9 — the trained table drops into ivf_topk(centroids=...)."""
    from kgpipe.similarity import (
        ivf_assign, ivf_centroids, ivf_topk, ivf_train,
    )

    emb = _clustered_embeddings(spark)
    seed = ivf_centroids(emb, n_cells=4)
    trained = ivf_train(emb, n_cells=4, n_iter=3)
    assert trained.count() <= 4  # empty cells drop (Lloyd drop-empty)
    assert trained.schema["centroid"].dataType.simpleString() == \
        "array<double>"

    def cell_sizes(cent):
        return [r["c"] for r in ivf_assign(emb, cent)
                .groupBy("cell").agg(F.count("*").alias("c")).collect()]

    assert max(cell_sizes(trained)) < max(cell_sizes(seed))

    gt = {(r["query_id"], r["neighbor_id"])
          for r in cosine_topk(emb, emb, k=1).collect()}

    def recall(cent):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ivf_topk(emb, emb, k=1, nprobe=1,
                                 centroids=cent).collect()}
        return len(gt & got) / len(gt)

    r_seed, r_trained = recall(seed), recall(trained)
    assert r_trained >= r_seed
    assert r_trained >= 0.9
    # every served neighbor still honors the probe contract
    assign = {r["vec_id"]: r["cell"]
              for r in ivf_assign(emb, trained).collect()}
    for r in ivf_topk(emb, emb, k=3, nprobe=1, centroids=trained).collect():
        assert assign[r["neighbor_id"]] == assign[r["query_id"]]


def test_decode_backend_flag(spark):
    """The multimodal decode kernel is an optional import: this
    container has no Pillow, so the recorded backend must be
    'ppm+wav+y4m-avi+stub' (real dependency-free PPM/PGM, WAV/PCM and
    Y4M/uncompressed-AVI decodes, stub for other formats; an environment
    with PIL flips the image kernel to 'pil+wav+y4m-avi' without plan
    changes)."""
    from kgpipe import multimodal

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    assert multimodal.decode_backend() == (
        "pil+wav+y4m-avi" if has_pil else "ppm+wav+y4m-avi+stub")
    if not has_pil:
        # stub path: features are the documented digest-fold fake
        media = synthetic_media(spark, n=3)
        row = extract_features(media, dim=8).filter(F.col("media_id") == 0) \
            .collect()[0]
        payload = media.filter(F.col("media_id") == 0).collect()[0]["content"]
        expect = multimodal._decode_image_stub(bytes(payload), 8)
        assert all(abs(a - b) < 1e-6          # float32 column vs py floats
                   for a, b in zip(row["feature"], expect))


def test_ppm_decode_known_luminance(spark):
    """The dependency-free PGM/PPM kernel is a REAL decode, verified
    against hand-computed luminance — the in-container stand-in for the
    PIL path (same [-1, 1) contract: px/128 − 1)."""
    from kgpipe import multimodal

    # P5 grayscale 8x2, column x has luminance 16*x in both rows
    row = bytes(16 * x for x in range(8))
    pgm = b"P5\n# comment\n8 2\n255\n" + row + row
    feats = multimodal._decode_image_ppm(pgm, dim=8)
    assert feats == [16 * x / 128.0 - 1.0 for x in range(8)]
    assert all(-1.0 <= f < 1.0 for f in feats)

    # P6 RGB with R=G=B=v → ITU-R 601-2 luminance == v exactly
    rgb = b"".join(bytes([16 * x] * 3) for x in range(8))
    ppm = b"P6 8 1 255\n" + rgb
    assert multimodal._decode_image_ppm(ppm, dim=8) == feats

    # dim < width: equal-width band box-average (bands of 2 columns)
    assert multimodal._decode_image_ppm(pgm, dim=4) == [
        (16 * (2 * b) + 16 * (2 * b + 1)) / 2 / 128.0 - 1.0
        for b in range(4)
    ]

    # corrupt/truncated P5 payloads fall back to the stub row-wise
    bad = b"P5 8 2 255\n" + row  # half the raster missing
    assert multimodal._decode_image(bad, 8) == \
        multimodal._decode_image_stub(bad, 8)

    # end-to-end through the Arrow-batched plan: a PGM media row gets
    # the real decode, a non-PPM row the stub, in the same batch
    media = spark.createDataFrame(
        [(0, "image", bytearray(pgm), None, None, None, None),
         (1, "image", bytearray(b"not-an-image"), None, None, None, None)],
        schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: list(r["feature"])
           for r in extract_features(media, dim=8).collect()}
    assert all(abs(a - b) < 1e-6 for a, b in zip(out[0], feats))
    assert all(abs(a - b) < 1e-6 for a, b in zip(
        out[1], multimodal._decode_image_stub(b"not-an-image", 8)))


def _y4m(frames: list, w: int, h: int, cs: str = "mono") -> bytes:
    """Minimal YUV4MPEG2 stream: each frame is a list of Y-plane bytes
    (chroma planes, when the colourspace has them, are zero-filled —
    the kernel never reads them)."""
    from kgpipe.multimodal import _Y4M_BPP

    pad = int(w * h * _Y4M_BPP[cs]) - w * h
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cs}\n".encode()
    return head + b"".join(
        b"FRAME\n" + bytes(f) + bytes(pad) for f in frames)


def _avi(frames: list, w: int, h: int, bits: int = 24) -> bytes:
    """Minimal uncompressed RIFF/AVI: hdrl (avih + strl(strh 'vids' +
    strf BITMAPINFOHEADER BI_RGB)) + movi with one '00db' DIB chunk per
    frame. Each frame is a list of rows, each row a list of pixel byte
    tuples (B,G,R) for 24-bit or single ints for 8-bit; rows are given
    TOP-down here and written bottom-up with 4-byte stride padding, as
    DIB requires."""
    import struct as _s

    def chunk(cid, body):
        return cid + _s.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    bpp = bits // 8
    stride = (w * bpp + 3) & ~3
    avih = _s.pack("<IIIIIIIIIIIIII", 40000, 0, 0, 0, len(frames), 0, 1,
                   0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + _s.pack("<IHHIIIIIIIII4H", 0, 0, 0, 0, 1,
                                       25, 0, len(frames), 0, 0, 0, 0,
                                       0, 0, w, h)
    strf = _s.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, stride * h,
                   0, 0, 0, 0)
    movi_frames = b""
    for f in frames:
        raster = b""
        for row in reversed(f):  # DIB rows are bottom-up
            if bits == 24:
                rb = b"".join(bytes(px) for px in row)
            else:
                rb = bytes(row)
            raster += rb + bytes(stride - len(rb))
        movi_frames += chunk(b"00db", raster)
    body = (lst(b"hdrl", chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
            + lst(b"movi", movi_frames))
    return b"RIFF" + _s.pack("<I", 4 + len(body)) + b"AVI " + body


def test_video_decode_known_luminance(spark):
    """The dependency-free Y4M and uncompressed-AVI kernels are REAL
    decodes, verified against hand-computed per-frame mean luminance —
    video joins image (PPM) and audio (WAV) as an in-container-verified
    media kind; no kind silently hash-stubs anymore. Contract:
    per-TIME-band mean luma, mean/128 − 1 (shared with the image
    kernel)."""
    from kgpipe import multimodal

    # Y4M mono 4x2, 2 frames: all-128 → 0.0, all-0 → −1.0
    clip = _y4m([[128] * 8, [0] * 8], w=4, h=2)
    assert multimodal._decode_video_y4m(clip, dim=2) == [0.0, -1.0]
    # kernel dispatch by magic hits the same path
    assert multimodal._decode_video(clip, dim=2) == [0.0, -1.0]

    # C420 chroma is skipped, not decoded: Y=64 everywhere → −0.5
    c420 = _y4m([[64] * 4], w=2, h=2, cs="420")
    assert multimodal._decode_video_y4m(c420, dim=1) == [-0.5]

    # 4 frames into 2 bands: band mean of per-frame means
    clip4 = _y4m([[0] * 8, [64] * 8, [128] * 8, [192] * 8], w=4, h=2)
    assert multimodal._decode_video_y4m(clip4, dim=2) == [
        (0 + 64) / 2 / 128.0 - 1.0, (128 + 192) / 2 / 128.0 - 1.0]

    # AVI 24-bit BGR 2x1, 2 frames: white → 255 → 0.9921875, black → −1
    # (B=G=R=v → ITU 601-2 luminance == v exactly, like the PPM test)
    white = [[(255, 255, 255), (255, 255, 255)]]
    black = [[(0, 0, 0), (0, 0, 0)]]
    avi = _avi([white, black], w=2, h=1)
    assert multimodal._decode_video_avi(avi, dim=2) == \
        [255 / 128.0 - 1.0, -1.0]
    assert multimodal._decode_video(avi, dim=2) == \
        [255 / 128.0 - 1.0, -1.0]

    # AVI 8-bit grayscale with stride padding (w=3 → stride 4): the pad
    # byte must NOT leak into the mean
    g = _avi([[[30, 60, 90]]], w=3, h=1, bits=8)
    assert multimodal._decode_video_avi(g, dim=1) == [60 / 128.0 - 1.0]

    # malformed payloads fall back to the stub row-wise, never decode
    # truncated bytes: chopped Y4M frame, lying RIFF chunk size,
    # unknown container, corrupt BITMAPINFOHEADER geometry (biWidth is
    # signed; w <= 0 must raise, not slice empty rows into fake -1.0s)
    i = avi.index(b"strf") + 12  # strf body: biSize(4) then biWidth
    neg_w = avi[:i] + (-2).to_bytes(4, "little", signed=True) + avi[i + 4:]
    for bad in (clip[:-4], avi[:-4], b"mpeg?", neg_w):
        assert multimodal._decode_media("video", bad, 8) == \
            multimodal._decode_image_stub(bad, 8)

    # end-to-end through the Arrow-batched plan: real video decode and
    # stub fallback in the same batch (per-kind dispatch)
    media = spark.createDataFrame(
        [(0, "video", bytearray(clip), None, None, None, None),
         (1, "video", bytearray(b"mpeg?"), None, None, None, None)],
        schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: list(r["feature"])
           for r in extract_features(media, dim=2).collect()}
    assert all(abs(a - b) < 1e-6 for a, b in zip(out[0], [0.0, -1.0]))
    assert all(abs(a - b) < 1e-6 for a, b in zip(
        out[1], multimodal._decode_image_stub(b"mpeg?", 2)))


def test_frame_sample_plan_real_counts(spark):
    """frame_sample_plan(use_payload_frames=True) fans out one row per
    REAL container frame (header/chunk walk via video_frame_count, luma
    untouched), not per metadata-declared timestamp; unparseable
    payloads fan out to zero rows."""
    from kgpipe import multimodal

    clip3 = _y4m([[0] * 8] * 3, w=4, h=2)          # 3 frames
    avi2 = _avi([[[(9, 9, 9)]]] * 2, w=1, h=1)      # 2 frames
    assert multimodal.video_frame_count(clip3) == 3
    assert multimodal.video_frame_count(avi2) == 2

    media = spark.createDataFrame(
        [(0, "video", bytearray(clip3), None, None, None, 9999),
         (1, "video", bytearray(avi2), None, None, None, 9999),
         (2, "video", bytearray(b"mpeg?"), None, None, None, 9999),
         (3, "image", bytearray(b"P5 1 1 255\n\x00"), None, None, None, 0)],
        schema=multimodal.MEDIA_SCHEMA)
    rows = frame_sample_plan(media, use_payload_frames=True).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert got == {0: [0, 1, 2], 1: [0, 1]}  # no unparseable, no image

    # stride: every 2nd frame
    rows = frame_sample_plan(media, use_payload_frames=True,
                             every_n_frames=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert got == {0: [0, 2], 1: [0]}


def _wav(samples_bytes: bytes, n_ch: int = 1, bits: int = 16,
         rate: int = 8000) -> bytes:
    """Minimal valid RIFF/WAVE container around a raw PCM data chunk."""
    import struct as _s

    block = n_ch * bits // 8
    fmt = _s.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    chunks = (b"fmt " + _s.pack("<I", len(fmt)) + fmt
              + b"data" + _s.pack("<I", len(samples_bytes)) + samples_bytes)
    return b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_known_rms(spark):
    """The dependency-free WAV/PCM kernel is a REAL decode, verified
    against hand-computed per-band RMS — the audio analog of the PPM
    image kernel (feature = 2·(rms/full_scale) − 1)."""
    import struct as _s

    from kgpipe import multimodal

    # 16-bit mono, 8 frames, dim=2 bands: band 0 silent → −1.0,
    # band 1 alternating ±16384 → rms 16384 → feature 0.0
    pcm16 = _s.pack("<8h", 0, 0, 0, 0, 16384, -16384, 16384, -16384)
    assert multimodal._decode_audio_wav(_wav(pcm16), dim=2) == [-1.0, 0.0]

    # 8-bit mono (unsigned, centered at 128): [128]*4 → −1.0;
    # 192/64 alternating → |dev| 64 → rms 64 → 2·(64/128)−1 = 0.0
    pcm8 = bytes([128, 128, 128, 128, 192, 64, 192, 64])
    assert multimodal._decode_audio_wav(_wav(pcm8, bits=8), dim=2) == \
        [-1.0, 0.0]

    # stereo mixes channels per frame BEFORE banding: L=16384, R=-16384
    # → mono 0 → silent
    st = _s.pack("<8h", *([16384, -16384] * 4))
    assert multimodal._decode_audio_wav(_wav(st, n_ch=2), dim=2) == \
        [-1.0, -1.0]

    # malformed RIFF (truncated data) raises; the dispatcher falls back
    # to the stub row-wise instead of failing the batch
    bad = _wav(b"")
    assert multimodal._decode_media("audio", bad, 8) == \
        multimodal._decode_image_stub(bad, 8)

    # a chunk whose DECLARED size exceeds the actual payload must raise
    # (→ stub), never silently decode the truncated bytes into
    # real-looking features: chop the last 4 bytes off a valid file
    lying = _wav(pcm16)[:-4]
    with pytest.raises(ValueError, match="truncated RIFF chunk"):
        multimodal._decode_audio_wav(lying, dim=2)
    assert multimodal._decode_media("audio", lying, 8) == \
        multimodal._decode_image_stub(lying, 8)

    # end-to-end through the Arrow-batched plan: an audio WAV row gets
    # the real decode, an image PGM row the image kernel, a video row
    # the stub — all in the same batch (per-kind dispatch)
    pgm = b"P5 8 1 255\n" + bytes(16 * x for x in range(8))
    media = spark.createDataFrame(
        [(0, "audio", bytearray(_wav(pcm16)), None, None, None, None),
         (1, "image", bytearray(pgm), None, None, None, None),
         (2, "video", bytearray(b"mpeg?"), None, None, None, None)],
        schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: list(r["feature"])
           for r in extract_features(media, dim=2).collect()}
    assert all(abs(a - b) < 1e-6 for a, b in zip(out[0], [-1.0, 0.0]))
    assert all(abs(a - b) < 1e-6 for a, b in zip(
        out[1], multimodal._decode_image_ppm(pgm, 2)))
    assert all(abs(a - b) < 1e-6 for a, b in zip(
        out[2], multimodal._decode_image_stub(b"mpeg?", 2)))


def test_pil_kernel_glue_via_fake(spark, monkeypatch):
    """_decode_image_pil's glue — the open/convert/resize/getdata call
    sequence, the px/128 − 1 mapping, the row-wise corrupt fallback —
    exercised through a minimal PIL-API fake (Pillow itself cannot be
    installed in this container; numeric agreement with real Pillow
    still requires an environment that ships it — the PPM kernel proves
    the shared contract here)."""
    from kgpipe import multimodal

    class _FakeImg:
        def __init__(self, px):
            self._px = px

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            w, h = wh
            assert h == 1
            return _FakeImg(self._px[:w])

        def getdata(self):
            return list(self._px)

    class _FakePIL:
        @staticmethod
        def open(fp):
            data = fp.read()
            if not data.startswith(b"OKIMG"):
                raise OSError("cannot identify image file")
            return _FakeImg(list(data[5:]))

    monkeypatch.setattr(multimodal, "_PILImage", _FakePIL)
    monkeypatch.setattr(multimodal, "_HAS_PIL", True)
    assert multimodal.decode_backend() == "pil+wav+y4m-avi"

    payload = b"OKIMG" + bytes([0, 64, 128, 192, 255, 16, 32, 48, 99])
    feats = multimodal._decode_image(payload, dim=8)
    assert feats == [px / 128.0 - 1.0
                     for px in [0, 64, 128, 192, 255, 16, 32, 48]]
    # payloads the (fake) decoder rejects fall back to the stub row-wise
    bad = b"corrupt"
    assert multimodal._decode_image(bad, 8) == \
        multimodal._decode_image_stub(bad, 8)


def test_jaccard_max_df_none_uncapped(spark):
    """max_df=None with no frac means explicitly UNCAPPED — every
    shingle joins — not a silent NULL predicate that empties the
    candidate set (the recall cliff the docstring warns about)."""
    rows = [(i, "a b c d e") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_pairs(docs, n=3, threshold=0.5,
                        max_df=None, max_df_frac=None)
    assert out.count() == 15  # all C(6,2) identical pairs


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_dedup_cache_hygiene(spark):
    """Eager dedup ops must not leave their O(corpus) intermediates
    (shingles / signatures) pinned: after a call only the RETURNED
    frame is cached, and unpersisting it restores the baseline."""
    docs = _docs(spark)
    ids = build_token_ids(docs).select("token", "token_id")

    n0 = _n_cached(spark)
    pairs = minhash_lsh_pairs(docs, ids)
    assert _n_cached(spark) == n0 + 1  # result only; signatures freed
    pairs.unpersist(blocking=True)
    assert _n_cached(spark) == n0

    n0 = _n_cached(spark)
    jp = jaccard_pairs(docs, n=3, threshold=0.1, max_df=10)
    assert _n_cached(spark) == n0 + 1  # result only; shingles freed
    jp.unpersist(blocking=True)
    assert _n_cached(spark) == n0


def _cached_ids(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keys())


def test_unpersist_after_scopes_all_eager_pair_paths(spark):
    """The caller-owns-unpersist contract is enforceable through ONE
    shared scope: each eager pair function (jaccard / minhash / simhash)
    routed through unpersist_after leaves zero cached RDDs behind —
    including when the consuming block raises. Tracked by RDD id (the
    async ContextCleaner may concurrently drop OTHER tests' checkpoint
    RDDs, so absolute counts are not stable — new ids are)."""
    from kgpipe.dedup import simhash_pairs, unpersist_after

    docs = _docs(spark)
    ids = build_token_ids(docs).select("token", "token_id")
    makers = [
        lambda: jaccard_pairs(docs, n=3, threshold=0.1, max_df=10),
        lambda: minhash_lsh_pairs(docs, ids),
        lambda: simhash_pairs(docs, ids),
    ]
    for make in makers:
        before = _cached_ids(spark)
        with unpersist_after(make()) as pairs:
            assert pairs.count() >= 1
            added = _cached_ids(spark) - before
            assert added                        # pair frame cached inside
        assert not (_cached_ids(spark) & added)  # released on exit

    before = _cached_ids(spark)
    try:
        with unpersist_after(minhash_lsh_pairs(docs, ids)) as pairs:
            added = _cached_ids(spark) - before
            raise RuntimeError("consumer failed")
    except RuntimeError:
        pass
    assert not (_cached_ids(spark) & added)      # released on error too


def test_dedup_clusters_representatives(spark):
    """LSH pairs → connected components → min-doc_id representative:
    chained near-dups collapse into one cluster."""
    from kgpipe.dedup import dedup_clusters

    rows = [
        (10, "a b c d e"),
        (11, "a b c d e"),          # dup of 10
        (12, "a b c d e"),          # dup of 10 → one cluster {10,11,12}
        (13, "z y x w v u t"),      # isolated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ids = build_token_ids(docs).select("token", "token_id")
    out = {r["doc_id"]: r["keep_id"]
           for r in dedup_clusters(docs, ids).collect()}
    assert out == {10: 10, 11: 10, 12: 10}   # 13 isolated → omitted
