"""Multimodal binary pathway: decode/feature stub, resize stub,
1→N frame sampling — schema, batching, and determinism of the
Arrow-batched plumbing (the codec itself is stubbed; see
operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.operators.multimodal import (
    extract_features,
    frame_sample_stub,
    resize_stub,
    text_as_media,
)
from big_data_processing_spark.sources.readers import load_table

from .conftest import TEST_SF_DIR


def _media(spark):
    return text_as_media(load_table(spark, TEST_SF_DIR, "documents"))


def test_feature_extraction_deterministic(spark):
    media = _media(spark)
    a = {r.media_id: (r.n_bytes, r.checksum32, tuple(r.feature)) for r in extract_features(media).collect()}
    b = {r.media_id: (r.n_bytes, r.checksum32, tuple(r.feature)) for r in extract_features(media).collect()}
    assert a == b
    assert len(a) == 500
    n_bytes = {r.media_id: r.n_bytes for r in extract_features(media).collect()}
    chars = {r.doc_id: r.n_chars for r in load_table(spark, TEST_SF_DIR, "documents").collect()}
    assert n_bytes == chars  # ascii text: bytes == chars


def test_resize_normalizes_payload_size(spark):
    resized = resize_stub(_media(spark), width=16, height=16)
    rows = resized.collect()
    assert all(r.n_bytes == 256 and len(r.payload) == 256 for r in rows)
    assert all(r.width == 16 and r.height == 16 for r in rows)


def test_frame_sampling_fans_out(spark):
    media = _media(spark).limit(20)
    frames = frame_sample_stub(media, frame_bytes=32, every_n=4)
    rows = frames.collect()
    assert len(rows) > 20  # 1→N fan-out
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    sizes = {r.media_id: r.n_bytes for r in _media(spark).limit(20)
             .select("media_id", F.octet_length("payload").alias("n_bytes")).collect()}
    for mid, fr in by_doc.items():
        total_frames = fr[0].n_frames
        assert total_frames == -(-sizes[mid] // 32)  # ceil division
        assert len(fr) == len(range(0, total_frames, 4))
        assert sorted(r.frame_idx for r in fr) == [i * 4 for i in range(len(fr))]
