"""Similarity search (exact + LSH) and multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_assessment_spark.functions import multimodal as mm
from data_quality_assessment_spark.operators import similarity as sim

DIM = 16
N = 200


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered corpus: 40 centroids x 5 noisy members — so "nearest
    neighbors" are real (cluster mates, cosine >> background), which is
    the regime ANN search is for."""
    rng = np.random.RandomState(3)
    centroids = rng.randn(N // 5, DIM)
    rows = []
    for i in range(N):
        base = centroids[i // 5]
        v = base + 0.15 * rng.randn(DIM)
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_topk(rows, qid, k):
    mat = {i: np.array(v, dtype=np.float64) for i, v in rows}
    q = mat[qid]
    scores = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in mat.items() if i != qid
    }
    return sorted(scores, key=lambda i: (-scores[i], i))[:k]


def test_cosine_topk_matches_numpy(spark, vectors):
    rows = [(r.vec_id, r.embedding) for r in vectors.collect()]
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = sim.cosine_topk(vectors, queries, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.vec_id)
    for qid in range(3):
        assert by_q[qid] == _numpy_topk(rows, qid, 5), f"query {qid}"


def test_lsh_topk_recall(spark, vectors):
    """LSH with 1-bit multiprobe recovers most of the exact top-5."""
    rows = [(r.vec_id, r.embedding) for r in vectors.collect()]
    queries = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = sim.lsh_topk(vectors, queries, dim=DIM, k=5, n_planes=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    hits = total = 0
    for qid in range(5):
        exact = set(_numpy_topk(rows, qid, 5))
        hits += len(exact & by_q.get(qid, set()))
        total += 5
    assert hits / total >= 0.5, f"LSH recall too low: {hits}/{total}"


def test_lsh_signature_deterministic(spark, vectors):
    a = vectors.select(
        sim.lsh_signature(F.col("embedding"), DIM, 8).alias("s")
    ).collect()
    b = vectors.select(
        sim.lsh_signature(F.col("embedding"), DIM, 8).alias("s")
    ).collect()
    assert [r.s for r in a] == [r.s for r in b]
    assert any(r.s != a[0].s for r in a)  # not degenerate


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", mm.encode_fake_image(640, 480, b"abc" * 50), "image/fake"),
        (2, "image", mm.encode_fake_image(32, 32, b"\x00" * 10), "image/fake"),
        (3, "image", b"\x89PNG\r\n\x1a\nrealpngbytes", "image/png"),
        (4, "audio", mm.encode_fake_audio(16000, 48000, b"pcm"), "audio/fake"),
        (5, "audio", b"RIFFxxxxWAVE", "audio/wav"),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_image_metadata(spark, media):
    got = {
        r.media_id: r
        for r in mm.image_metadata(media.filter("kind = 'image'")).collect()
    }
    assert (got[1].width, got[1].height, got[1].valid) == (640, 480, True)
    assert (got[2].width, got[2].height) == (32, 32)
    assert got[3].valid is False  # real PNG -> stubbed seam, not a crash
    assert got[3].width is None


def test_image_features_shape_and_determinism(spark, media):
    img = media.filter("media_id in (1, 2)")
    a = {r.media_id: r.features for r in mm.image_features(img).collect()}
    b = {r.media_id: r.features for r in mm.image_features(img).collect()}
    assert a.keys() == {1, 2}
    assert all(len(v) == 16 for v in a.values())
    assert a == b
    nrm = sum(x * x for x in a[1]) ** 0.5
    assert abs(nrm - 1.0) < 1e-5


def test_audio_metadata(spark, media):
    got = {
        r.media_id: r
        for r in mm.audio_metadata(media.filter("kind = 'audio'")).collect()
    }
    assert (got[4].sample_rate, got[4].n_samples) == (16000, 48000)
    assert got[4].duration_sec == 3.0
    assert got[5].valid is False


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 10)], "media_id long, n_frames int"
    )
    got = sorted(
        (r.media_id, r.frame_idx)
        for r in mm.frame_sample_plan(df, every_n=30).collect()
    )
    assert got == [(1, 0), (1, 30), (1, 60), (1, 90), (2, 0)]


def test_ivf_topk_recall_and_partition(spark, vectors):
    """IVF-flat: every corpus vector in exactly one cell; nprobe search
    recovers most of the exact top-5 on clustered data, and recall is
    monotone in nprobe (more probed cells can only add candidates)."""
    cells = vectors.select(
        sim.ivf_cell(F.col("embedding"), sim.ivf_codebook(8, DIM)).alias("c")
    ).collect()
    assert all(0 <= r.c < 8 for r in cells)

    rows = [(r.vec_id, r.embedding) for r in vectors.collect()]
    queries = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    def recall(nprobe):
        got = sim.ivf_topk(vectors, queries, dim=DIM, k=5,
                           n_centroids=8, nprobe=nprobe).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.q_id, set()).add(r.vec_id)
        hits = sum(
            len(set(_numpy_topk(rows, qid, 5)) & by_q.get(qid, set()))
            for qid in range(5)
        )
        return hits / 25

    r2, r8 = recall(2), recall(8)
    assert r8 == 1.0, f"full probe must equal exact: {r8}"
    assert r2 <= r8
    assert recall(4) >= 0.5, "nprobe=4 recall too low"


def test_ivf_trained_codebook_seam(spark, vectors):
    """The pyspark.ml KMeans-trained codebook drops into the same plan
    (production path); with k = number of true clusters the trained
    cells should give high recall at small nprobe."""
    cb = sim.train_ivf_codebook(vectors, n_centroids=4)
    assert len(cb) == 4 and len(cb[0]) == DIM
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    rows = [(r.vec_id, r.embedding) for r in vectors.collect()]
    got = sim.ivf_topk(vectors, queries, dim=DIM, k=5,
                       codebook=cb, nprobe=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(
        len(set(_numpy_topk(rows, qid, 5)) & by_q.get(qid, set()))
        for qid in range(3)
    )
    assert hits / 15 >= 0.6, f"trained-codebook recall: {hits}/15"
