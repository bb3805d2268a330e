"""Multimodal plumbing + approximate-op sanity tests (the rows-only
queries' real assertions live here, since they can't oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_multimodal_batch_shape(spark, sf_dir):
    from pipeline_usnvc_spark.operators.multimodal import (
        extract_features,
        synthesize_binary_column,
    )
    from pipeline_usnvc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    with_media = synthesize_binary_column(docs)
    # schema contract: binary payload + typed metadata struct
    assert dict(with_media.dtypes)["media"] == "binary"
    feats = extract_features(with_media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert len(r["features"]) == 16
        assert r["n_bytes"] > 0
        # synthesized payloads are REAL PPM images now: the extractor
        # must take the decode path, not the byte-histogram stub
        # (VERDICT r02 item 5)
        assert r["feature_kind"] == "ppm_rgb_stats"
        # channel means/stds and luminance extrema live in [0, 1]
        assert all(0.0 <= x <= 1.0 for x in r["features"][:8])
        # the 8-bin luminance histogram is normalized
        assert abs(sum(r["features"][8:]) - 1.0) < 1e-6


def test_ppm_decode_correctness():
    """Byte-exact decode check on a hand-written 2x2 P6 image,
    including a header comment (the grammar corner real encoders
    emit)."""
    import numpy as np

    from pipeline_usnvc_spark.operators.multimodal import decode_ppm

    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    buf = b"P6\n# test comment\n2 2\n255\n" + raster
    img = decode_ppm(buf)
    assert img.shape == (2, 2, 3)
    assert img.dtype == np.uint8
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [10, 20, 30]

    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n2 2\n255\n" + raster)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n" + raster[:-1])


def test_ppm_synthesis_roundtrip(spark):
    """The native hex→repeat→unhex synthesis must produce payloads the
    decoder reads back with exactly the metadata's dims, pixels being
    the text's utf-8 bytes cycled — verified byte-for-byte, including
    a multi-byte (non-ASCII) text where char-based substring would
    have corrupted the raster length."""
    import numpy as np

    from pipeline_usnvc_spark.operators.multimodal import (
        decode_ppm,
        synthesize_binary_column,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "héllo wörld ü"), (3, "")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in synthesize_binary_column(docs).collect()}
    for did, r in rows.items():
        meta = r["media_meta"]
        assert meta["mime"] == "image/x-portable-pixmap"
        assert meta["n_bytes"] == len(r["media"])
        img = decode_ppm(bytes(r["media"]))
        assert img.shape == (meta["height"], meta["width"], 3)
        seed = r["text"].encode("utf-8") or b"\x00"
        need = meta["width"] * meta["height"] * 3
        expect = (seed * (need // len(seed) + 1))[:need]
        assert img.tobytes() == expect, f"doc {did}: raster != cycled text bytes"


def _expect_metadata_breach(df):
    """Collect ``df`` expecting the fail-fast 'metadata breach' error.

    Local-mode artifact this must tolerate: a prior intentional job
    abort can kill the shared Python daemon mid-handshake, so the NEXT
    action occasionally dies with ClosedChannelException /
    CancelledKeyException / 'Python worker exited' BEFORE the UDF runs
    (observed r13 full-suite runs; the breach ValueError still shows in
    executor stderr, but the job-abort reason records the racing infra
    failure from another task). The caller shrinks the frame to ONE
    task to remove most of that race surface; the residual infra
    signature gets ONE retry; the contract itself — the breach message
    must surface — stays strict.
    """
    for attempt in (0, 1):
        try:
            df.collect()
        except Exception as e:  # noqa: BLE001 — Py4JJavaError or wrapped
            msg = str(e)
            if "metadata breach" in msg:
                return
            if attempt == 0 and (
                "ClosedChannelException" in msg
                or "CancelledKeyException" in msg
                or "Python worker" in msg
            ):
                continue
            raise
        else:
            pytest.fail("expected a 'metadata breach' failure, got rows")
    pytest.fail("worker-crash retry also failed without 'metadata breach'")


def test_multimodal_rejects_malformed_metadata(spark):
    # Adversarial contract test: the plumbing must FAIL FAST on
    # metadata that lies (bad dims / byte-count mismatch), not emit
    # garbage features (VERDICT r1 item 3).
    from pipeline_usnvc_spark.operators.multimodal import extract_features

    # ONE partition → one task: with default parallelism this 1-row
    # frame spreads over 32 mostly-empty tasks, and when the breach
    # task aborts the stage a concurrently-dying empty task's infra
    # error (CancelledKeyException) can be recorded as the job-abort
    # reason instead of the breach (observed r13).
    base = spark.createDataFrame(
        [(1, b"payload")], "doc_id bigint, media binary"
    ).coalesce(1)

    bad_dims = base.withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(-3).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(7).cast("bigint").alias("n_bytes"),
        ),
    )
    _expect_metadata_breach(extract_features(bad_dims))

    lying_n_bytes = base.withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(3).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(999).cast("bigint").alias("n_bytes"),
        ),
    )
    _expect_metadata_breach(extract_features(lying_n_bytes))


def test_thumbnail_resize_correctness(spark):
    """resize_nearest picks pixel-center nearest neighbors; the
    luminance grid from thumbnail_features must match a hand-computed
    numpy reference on a crafted 4x8 image downsampled to 4x4."""
    import numpy as np

    from pipeline_usnvc_spark.operators.multimodal import (
        decode_ppm,
        resize_nearest,
        thumbnail_features,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(4, 8, 3), dtype=np.uint8)
    # pixel-center sampling: rows map to themselves (4→4), cols 8→4
    # pick centers at x = (i+0.5)*2 → indices 1, 3, 5, 7
    expect = img[:, [1, 3, 5, 7]]
    assert (resize_nearest(img, 4, 4) == expect).all()

    buf = b"P6\n8 4\n255\n" + img.tobytes()
    assert (decode_ppm(buf) == img).all()
    df = spark.createDataFrame(
        [(1, bytearray(buf))], "doc_id bigint, media binary"
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(8).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(len(buf)).cast("bigint").alias("n_bytes"),
        ),
    )
    row = thumbnail_features(df, grid=4).collect()[0]
    assert row["feature_kind"] == "ppm_thumb_lum_4x4"
    t = expect.astype(np.float64) / 255.0
    lum = 0.299 * t[..., 0] + 0.587 * t[..., 1] + 0.114 * t[..., 2]
    assert np.allclose(row["features"], lum.ravel(), atol=1e-6)

    # non-PPM mimes must fail fast, not silently emit garbage
    bad = df.withColumn(
        "media_meta",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit(8).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(len(buf)).cast("bigint").alias("n_bytes"),
        ),
    )
    with pytest.raises(Exception, match="no decoder for mime"):
        thumbnail_features(bad).collect()


def test_multimodal_deterministic(spark, sf_dir):
    from pipeline_usnvc_spark.plans import QUERIES

    a = QUERIES["q70_multimodal_features"](spark, sf_dir).orderBy("doc_id").limit(5).collect()
    b = QUERIES["q70_multimodal_features"](spark, sf_dir).orderBy("doc_id").limit(5).collect()
    assert a == b


def test_approx_count_distinct_bounds(spark, sf_dir):
    from pipeline_usnvc_spark.plans import QUERIES

    rows = QUERIES["q71_approx_count_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HLL++ default rsd 5% — allow 3x slack for tiny cardinalities
        assert abs(r["approx_parts"] - r["exact_parts"]) <= max(5, 0.15 * r["exact_parts"])


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    from pipeline_usnvc_spark.operators.similarity import brute_force_topk, lsh_topk
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5).collect()
    # DEFAULT config (16 tables x 4 planes) — the q62 path. Measured
    # recall@5: 1.00 at sf0.001, 0.84 at sf0.01 (VERDICT r1 item 2).
    approx = lsh_topk(emb, queries, k=5).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.7, f"LSH default-config recall {recall} too low"


@pytest.mark.slow  # recall stress
def test_multiprobe_beats_single_probe(spark, sf_dir):
    from pipeline_usnvc_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        multiprobe_lsh_topk,
    )
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, queries, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=5, n_planes=4, n_tables=1).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in multiprobe_lsh_topk(emb, queries, k=5, n_planes=4, nprobe=5).collect()
    }
    r_single = len(exact_pairs & single) / len(exact_pairs)
    r_multi = len(exact_pairs & multi) / len(exact_pairs)
    # extra probes only widen the candidate set → recall monotone in nprobe
    assert r_multi >= r_single, f"multi-probe {r_multi} < single-probe {r_single}"
    # measured: single-probe 0.20, multi-probe 0.60 at these settings
    assert r_multi >= 0.4, f"multi-probe recall {r_multi} too low"


@pytest.mark.slow  # recall stress (~50 s)
def test_pq_recall_vs_exact_l2(spark, sf_dir):
    from pipeline_usnvc_spark.operators.similarity import brute_force_topk, pq_topk
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5, metric="l2").collect()
    approx = pq_topk(emb, queries, k=5).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 16 subspaces × 16 centroids on *random* 64-dim data (worst case
    # for PQ — no low-dim structure to exploit); measured 0.40
    assert recall >= 0.3, f"PQ recall {recall} too low"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from pipeline_usnvc_spark.operators.similarity import brute_force_topk, ivf_topk
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # probing half the cells should recover a majority of true neighbors
    assert recall >= 0.5, f"IVF recall {recall} too low"


@pytest.mark.slow  # recall stress
def test_embedding_near_dup_lsh_recall(spark, sf_dir):
    # Exact truth: all-pairs cosine >= 0.4 — the synthetic corpus's
    # near-dup band; its max pairwise sim is ~0.5, so 0.9 would match
    # nothing (2k vectors at sf0.001: the cross join is test-only).
    # The q164 config (24 tables x 4 planes) measured recall 1.00
    # here; assert >= 0.95 with zero false positives.
    from pipeline_usnvc_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )
    from pipeline_usnvc_spark.operators.similarity import embedding_near_dup_lsh
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", to_double_array("embedding").alias("v"))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_similarity(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= 0.4)
        .collect()
    }
    assert exact, "fixture should contain near-dup embedding pairs"
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(emb, threshold=0.4, n_tables=24).collect()
    }
    assert got <= exact  # verify step is exact: no false positives
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"near-dup LSH recall {recall} too low"


def test_wav_roundtrip_and_dominant_frequency(spark):
    """decode_wav inverts encode_wav byte-exactly; a pure sine tone's
    dominant rFFT bin recovers the synthesis frequency within one bin;
    chunk-walk handles a LIST chunk before data."""
    import numpy as np
    import struct

    from pipeline_usnvc_spark.operators.multimodal import decode_wav, encode_wav

    rate, freq, n = 8000, 440.0, 4000
    t = np.arange(n) / rate
    wave = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
    buf = encode_wav(wave, rate)
    out, out_rate = decode_wav(buf)
    assert out_rate == rate and (out == wave).all()

    spectrum = np.abs(np.fft.rfft(out.astype(np.float64)))
    spectrum[0] = 0.0
    dom = np.argmax(spectrum) * rate / n
    assert abs(dom - freq) <= rate / n  # within one FFT bin

    # robustness: an extra LIST chunk between fmt and data must be skipped
    body = buf[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = b"RIFF" + struct.pack("<I", len(body) + len(extra) + 4) + b"WAVE" + \
        body[:24] + extra + body[24:]
    out2, _ = decode_wav(patched)
    assert (out2 == wave).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")


def test_audio_features_pipeline(spark, sf_dir):
    """q209: every synthesized doc yields real decoded features; the
    dominant frequency matches the synthesis formula per doc."""
    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.sources.tables import load_table

    feats = {r["doc_id"]: r for r in QUERIES["q209_audio_features"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(feats) == len(docs)
    for d in docs[:25]:
        r = feats[d["doc_id"]]
        n = len(d["text"] or "")
        expect_freq = 200.0 + (n % 40) * 50.0
        bin_hz = r["sample_rate"] / r["n_samples"]
        assert abs(r["dominant_hz"] - expect_freq) <= bin_hz
        assert r["feature_kind"] == "wav_pcm_stats"
        # a 12000/32768-amplitude sine: rms = A/sqrt(2) ≈ 0.259
        assert 0.24 < r["rms"] < 0.28


def test_video_stream_decode_and_sampling(spark):
    """decode_ppm_stream splits mixed-size concatenated frames at the
    right boundaries; sample_video_frames keeps exactly the stride
    frames with correct luminance."""
    import numpy as np

    from pipeline_usnvc_spark.operators.multimodal import (
        decode_ppm_stream,
        sample_video_frames,
    )

    f1 = np.full((2, 2, 3), 10, dtype=np.uint8)
    f2 = np.full((3, 1, 3), 200, dtype=np.uint8)
    f3 = np.full((2, 2, 3), 255, dtype=np.uint8)
    buf = (
        b"P6\n2 2\n255\n" + f1.tobytes()
        + b"P6\n1 3\n255\n" + f2.tobytes()
        + b"P6\n2 2\n255\n" + f3.tobytes()
    )
    frames = decode_ppm_stream(buf)
    assert [f.shape for f in frames] == [(2, 2, 3), (3, 1, 3), (2, 2, 3)]
    assert frames[1][0, 0, 0] == 200

    df = spark.createDataFrame([(7, bytearray(buf))], "doc_id bigint, media binary").withColumn(
        "media_meta",
        F.struct(
            F.lit("video/x-ppm-stream").alias("mime"),
            F.lit(3).cast("int").alias("n_frames"),
            F.lit(len(buf)).cast("bigint").alias("n_bytes"),
        ),
    )
    rows = sorted(
        sample_video_frames(df, every_k=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 2]  # stride 2 keeps frames 0 and 2
    assert abs(rows[0]["mean_lum"] - 10 / 255.0) < 1e-9
    assert abs(rows[1]["mean_lum"] - 1.0) < 1e-9


def test_audio_features_stereo_downmix(spark):
    """Stereo WAVs must downmix to mono before time-axis features —
    the dominant frequency of an identical-channel stereo tone equals
    the mono tone's."""
    import numpy as np
    import struct

    from pipeline_usnvc_spark.operators.multimodal import audio_features, encode_wav

    rate, freq, n = 8000, 440.0, 4000
    t = np.arange(n) / rate
    mono = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
    stereo = np.column_stack([mono, mono]).ravel()
    pcm = stereo.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 2, rate, rate * 4, 4, 16,
        b"data", len(pcm),
    )
    df = spark.createDataFrame(
        [(1, bytearray(hdr + pcm))], "doc_id bigint, media binary"
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(rate).cast("int").alias("sample_rate"),
            F.lit(n).cast("bigint").alias("n_samples"),
            F.lit(len(hdr) + len(pcm)).cast("bigint").alias("n_bytes"),
        ),
    )
    r = audio_features(df).collect()[0]
    assert abs(r["dominant_hz"] - freq) <= rate / n
    assert 0.24 < r["rms"] < 0.28


# ---------------------------------------------------------------------------
# Round-6 in-plan recomputation contracts (VERDICT r05 item 2): the
# rows-only multimodal queries now carry executed JVM-side recomputes
# of what the Python UDFs extracted. Pin (a) the clean path passes at
# full doc-grain and (b) a corrupted extraction trips the contract —
# the contract must carry signal, not just exist.
# ---------------------------------------------------------------------------
def test_q70_contract_fires_on_corrupted_features(spark, sf_dir, monkeypatch):
    import pipeline_usnvc_spark.operators.multimodal as mm
    from pipeline_usnvc_spark.plans import QUERIES

    orig = mm.extract_features

    def corrupted(df):
        return orig(df).withColumn(
            "features",
            F.concat(
                F.array(F.element_at("features", 1) + F.lit(0.001).cast("float")),
                F.slice("features", 2, 15),
            ),
        )

    monkeypatch.setattr(mm, "extract_features", corrupted)
    with pytest.raises(Exception, match="recompute breach"):
        QUERIES["q70_multimodal_features"](spark, sf_dir).count()


def test_q210_contract_fires_on_dropped_frame(spark, sf_dir, monkeypatch):
    """A sampled frame silently missing from the output must EXIST as
    a spine row the contract evaluates (the vacuous-pass trap)."""
    import pipeline_usnvc_spark.operators.multimodal as mm
    from pipeline_usnvc_spark.plans import QUERIES

    orig = mm.sample_video_frames

    def dropping(df, every_k=2):
        return orig(df, every_k).filter(F.col("frame_idx") != 2)

    monkeypatch.setattr(mm, "sample_video_frames", dropping)
    with pytest.raises(Exception, match="recompute breach"):
        QUERIES["q210_video_frame_sample"](spark, sf_dir).count()


def test_q199_contract_fires_on_cell_corruption(spark, sf_dir, monkeypatch):
    import pipeline_usnvc_spark.operators.multimodal as mm
    from pipeline_usnvc_spark.plans import QUERIES

    orig = mm.thumbnail_features

    def corrupted(df, grid=4):
        return orig(df, grid).withColumn(
            "features",
            F.concat(
                F.array(F.element_at("features", 1) + F.lit(0.01).cast("float")),
                F.slice("features", 2, 15),
            ),
        )

    monkeypatch.setattr(mm, "thumbnail_features", corrupted)
    with pytest.raises(Exception, match="recompute breach"):
        QUERIES["q199_thumbnail_grid"](spark, sf_dir).count()


def test_q209_contract_fires_on_frequency_drift(spark, sf_dir, monkeypatch):
    import pipeline_usnvc_spark.operators.multimodal as mm
    from pipeline_usnvc_spark.plans import QUERIES

    orig = mm.audio_features

    def drifted(df):
        return orig(df).withColumn(
            "dominant_hz", F.col("dominant_hz") + F.lit(100.0)
        )

    monkeypatch.setattr(mm, "audio_features", drifted)
    with pytest.raises(Exception, match="recompute breach"):
        QUERIES["q209_audio_features"](spark, sf_dir).count()


def test_multimodal_contract_queries_pass_clean(spark, sf_dir):
    """Clean path: all four contract-carrying multimodal queries run
    their executed recomputes at doc grain and keep every row."""
    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert QUERIES["q70_multimodal_features"](spark, sf_dir).count() == n_docs
    assert QUERIES["q199_thumbnail_grid"](spark, sf_dir).count() == n_docs
    assert QUERIES["q209_audio_features"](spark, sf_dir).count() == n_docs
    assert QUERIES["q210_video_frame_sample"](spark, sf_dir).count() == n_docs * 3


def test_q335_phash_contract_fires_on_nondeterminism(spark, sf_dir, monkeypatch):
    """Perturbing one replica's decoded grid (simulated nondeterminism
    in the Python path) must break the fp → phash functional
    dependency and raise at execution time."""
    import pipeline_usnvc_spark.operators.multimodal as mm
    from pipeline_usnvc_spark.plans import QUERIES

    orig = mm.thumbnail_features

    def unstable(df, grid=4):
        out = orig(df, grid)
        return out.withColumn(
            "features",
            F.when(
                F.col("doc_id") < 0,  # planted replicas are negative ids
                F.concat(
                    F.array(F.element_at("features", 1) + F.lit(0.5).cast("float")),
                    F.slice("features", 2, 15),
                ),
            ).otherwise(F.col("features")),
        )

    monkeypatch.setattr(mm, "thumbnail_features", unstable)
    with pytest.raises(Exception, match="different phashes"):
        QUERIES["q335_image_phash_neardup"](spark, sf_dir).count()


def test_q335_planted_replicas_bucket_with_sources(spark, sf_dir):
    from pipeline_usnvc_spark.plans import QUERIES

    rows = QUERIES["q335_image_phash_neardup"](spark, sf_dir).collect()
    multi = [r for r in rows if r["n_docs"] > 1]
    # every 10th doc is replicated: those fp-pairs must share buckets
    assert len(multi) >= 40
    assert all(r["n_distinct_texts"] <= r["n_docs"] for r in rows)


def test_lsh_buckets_bit_identical_across_engines(spark, sf_dir):
    """Round-13 exactness root: the Spark bucketer (quantized integer
    matmul in mapInPandas) and the DuckDB CTE twin (lsh_buckets_sql)
    must produce the IDENTICAL (vec_id, table, bucket) set — this is
    the fact that upgrades q62/q164 from rows-only recall contracts
    to full hash oracles. Checked at the q62 config (16x4); q164's
    24x4 shares every code path."""
    import duckdb

    from pipeline_usnvc_spark.operators.similarity import (
        _table_bucket_ids,
        lsh_buckets_sql,
    )
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sb = _table_bucket_ids(emb, 16, 4, 64, "vec_id", "embedding").select(
        "vec_id", F.col("tb.t").alias("t"), F.col("tb.b").alias("b")
    )
    srows = sorted((r.vec_id, r.t, r.b) for r in sb.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    drows = sorted(
        tuple(r)
        for r in con.execute(
            "WITH " + lsh_buckets_sql(16, 4) + " SELECT vec_id, t, b FROM buckets"
        ).fetchall()
    )
    con.close()
    assert len(srows) == len(drows) > 0
    assert srows == drows
