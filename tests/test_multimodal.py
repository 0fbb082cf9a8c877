"""Multimodal-column plumbing: binary payload + typed meta, Arrow-batched
decode/resize/frame-sample/feature ops (stub codec, real dataflow)."""

import hashlib

import pytest

from extract_cbd_shape_spark.functions.multimodal import (
    decode_media,
    frame_sample,
    media_features,
    real_decode,
    resize_media,
    synth_media,
)
from extract_cbd_shape_spark.operators.similarity import cosine_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, SF).cache()


def test_synth_schema_and_determinism(media):
    assert dict(media.dtypes)["payload"] == "binary"
    rows = {r.media_id: r for r in media.collect()}
    r0 = rows[0]
    assert r0.kind == "image"
    md5 = hashlib.md5(b"0").hexdigest()
    assert bytes(r0.payload) == md5.encode()  # reps = 1 + 0 % 4
    assert r0.meta.width == 16 and r0.meta.height == 16
    assert rows[1].kind == "audio" and rows[1].meta.width is None
    assert rows[2].kind == "video" and rows[2].meta.duration_ms == 2000


def test_decode_checksum_matches_payload(media):
    joined = decode_media(media).join(media, "media_id").collect()
    for r in joined:
        assert r.checksum == hashlib.md5(bytes(r.payload)).hexdigest()
        assert r.payload_len == len(bytes(r.payload))


def test_frame_sample_counts(media):
    frames = frame_sample(media, step_ms=500)
    per = {r.media_id: r.n for r in
           frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    vids = {r.media_id: r.meta.duration_ms
            for r in media.filter("kind = 'video'").collect()}
    assert set(per) == set(vids)
    for mid, dur in vids.items():
        assert per[mid] == dur // 500


def test_resize_clamps_and_truncates(media):
    out = {r.media_id: r for r in resize_media(media, 32, 32).collect()}
    src = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        m = src[mid].meta
        if m.width is None:
            assert bytes(r.payload) == bytes(src[mid].payload)
        else:
            assert r.width <= 32 and r.height <= 32
            assert len(bytes(r.payload)) <= len(bytes(src[mid].payload))


def test_features_feed_similarity(spark, media):
    feats = media_features(media, dim=8).withColumnRenamed(
        "media_id", "vec_id").withColumnRenamed("feature", "embedding")
    q = feats.limit(2)
    top = cosine_topk(feats, q, k=3)
    assert top.count() > 0
    assert set(top.columns) == {"query_id", "neighbor_id", "score", "rank"}


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "fake-image")


def test_ivf_subset_of_probed_lists(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter("vec_id < 4")
    ivf = ivf_topk(e, q, k=5, centroid_stride=16, nprobe=2)
    rows = ivf.collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert 1 <= r.rank <= 5 and -1.0001 <= r.score <= 1.0001
    # IVF scores for returned pairs equal the exact cosine scores
    exact = {(r.query_id, r.neighbor_id): r.score
             for r in cosine_topk(e, q, k=10**6).collect()}
    for r in rows:
        assert abs(exact[(r.query_id, r.neighbor_id)] - r.score) < 1e-6
