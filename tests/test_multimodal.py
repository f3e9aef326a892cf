"""Tests for the multimodal plumbing: binary schema, Arrow-batched
feature extraction (verified with hashlib), frame-sampling explode, and
the clearly-marked decode stub."""

from __future__ import annotations

import hashlib

import pytest

from birli_spark.operators import multimodal
from birli_spark.sources import corpus


def test_media_schema_and_features(spark, sf_dir):
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 20")
    media = multimodal.attach_media(docs)
    assert dict(media.dtypes)["media"] == "binary"
    got = multimodal.media_features(media).orderBy("doc_id").toPandas()
    src = docs.orderBy("doc_id").toPandas()
    for g, text in zip(got.itertuples(), src.text):
        payload = text.encode("utf-8")
        assert g.n_bytes == len(payload)
        assert g.content_md5 == hashlib.md5(payload).hexdigest()
        assert g.aspect == g.width / g.height


def test_frame_sampling_offsets(spark, sf_dir):
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 20")
    media = multimodal.attach_media(docs)
    frames = multimodal.sample_frames(media).toPandas()
    meta = media.select("doc_id", "n_frames").toPandas().set_index("doc_id")
    for doc_id, grp in frames.groupby("doc_id"):
        n = int(meta.loc[doc_id].n_frames)
        assert sorted(grp.frame_idx) == list(range(n))
        offs = grp.sort_values("frame_idx").frame_off.tolist()
        assert offs[0] == 0
        assert all(a <= b for a, b in zip(offs, offs[1:]))  # monotone


def test_decode_stub_is_gated(spark):
    if multimodal._HAVE_PIL:
        pytest.skip("PIL present; stub path not applicable")
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image(b"\x89PNG")


def test_resize_media_fit_box_and_slice(spark, sf_dir):
    import hashlib
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 40")
    media = multimodal.attach_media(docs)
    out = {r.doc_id: r for r in multimodal.resize_media(media).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    box = multimodal.RESIZE_BOX
    for did, r in out.items():
        scale = min(box / r.width, box / r.height, 1.0)
        assert r.target_w == max(1, int(r.width * scale))
        assert r.target_h == max(1, int(r.height * scale))
        assert r.target_w <= box and r.target_h <= box
        payload = texts[did].encode()
        k = len(payload) * r.target_w * r.target_h // (r.width * r.height)
        assert r.resized_bytes == k
        assert r.resized_md5 == hashlib.md5(payload[:k]).hexdigest()


def test_audio_waveform_stats_constructed(spark):
    from pyspark.sql import Row
    import numpy as np
    from birli_spark.operators import multimodal
    # "@" = 64 = PCM zero; "A" = +1, "?" = -1 -> crossings between them
    docs = spark.createDataFrame([Row(doc_id=0, text="A?A?@A")])
    media = multimodal.attach_media(docs)
    out = multimodal.audio_waveform_stats(media).collect()[0]
    s = np.frombuffer(b"A?A?@A", dtype=np.uint8).astype(int) - 64
    assert out.n_samples == 6
    assert out.sum_amp == int(s.sum())
    assert out.max_abs == 1
    # sign products: (1,-1),(-1,1),(1,-1),(-1,0),(0,1) -> 3 crossings
    assert out.n_zero_cross == 3


def _phash_py(payload: bytes) -> list[int]:
    head = list(payload[:64]) + [0] * max(0, 64 - len(payload))
    tot = sum(head)
    bits = [1 if v * 64 > tot else 0 for v in head]
    return [sum(bits[16 * j + i] << i for i in range(16)) for j in range(4)]


def test_phash_signatures_match_python(spark, sf_dir):
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 10")
    media = multimodal.attach_media(docs)
    got = {r.doc_id: [r.b0, r.b1, r.b2, r.b3]
           for r in multimodal.phash_signatures(media).collect()}
    for row in docs.select("doc_id", "text").collect():
        assert got[row.doc_id] == _phash_py(row.text.encode())


def test_phash_neardup_plants_pair(spark):
    from pyspark.sql import Row
    base = "x" * 30 + "Z" * 34          # strong bit pattern
    tweaked = base[:5] + "y" + base[6:]  # one byte changed -> tiny hamming
    far = ("ab" * 32)                    # alternating -> different hash
    docs = spark.createDataFrame([
        Row(doc_id=0, text=base), Row(doc_id=1, text=tweaked),
        Row(doc_id=2, text=far)])
    media = multimodal.attach_media(docs)
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in multimodal.phash_neardup(media).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_scene_cuts_constructed(spark):
    from pyspark.sql import Row
    fb = multimodal.FRAME_BYTES
    # frame A of 'a's, frame B of 'z's: delta = 16 * 25 = 400 > 320 (cut);
    # frame C of 'y's: delta = 16 -> no cut; 5 trailing bytes ignored
    text = "a" * fb + "z" * fb + "y" * fb + "tail!"
    docs = spark.createDataFrame([Row(doc_id=0, text=text),
                                  Row(doc_id=1, text="short")])
    media = multimodal.attach_media(docs)
    out = {r.doc_id: r for r in multimodal.scene_cuts(media).collect()}
    r = out[0]
    assert r.n_frames == 3
    assert r.n_cuts == 1 and r.first_cut == 1
    assert r.max_delta == 16 * 25
    s = out[1]                       # < 2 frames -> no deltas
    assert s.n_frames == 0 and s.n_cuts == 0
    assert s.first_cut == -1 and s.max_delta == 0


def test_audio_landmarks_detect_shared_waveform(spark):
    from pyspark.sql import Row

    from birli_spark.operators import multimodal
    # a spiky "waveform": peaks at known offsets; doc 2 repeats doc 1's
    # pattern (same landmarks), doc 3 is flat (no peaks at all)
    def spike(amp):
        return "aa" + chr(64 + amp) + "aa"      # peak over 'a'=33
    # four distinct-amplitude peaks -> three DISTINCT landmark keys
    pattern = ("  " + spike(40) + "  " + spike(45) + "  " + spike(50)
               + "  " + spike(55) + "  ")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=pattern, lang="en", source="s", n_chars=0),
        Row(doc_id=2, text=pattern, lang="en", source="s", n_chars=0),
        Row(doc_id=3, text="bbbbbbbbbbbbbbbb", lang="en", source="s",
            n_chars=0)])
    out = multimodal.audio_landmark_pairs(docs, min_shared=3).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(1, 2)}
    assert out[0].n_shared >= 3
