"""Multimodal plumbing tests: Arrow batch shape, schemas, stub gating."""

import pytest

from hogzilla_spark.operators import multimodal as MM

def test_decode_and_featurize_plumbing(spark):
    media = MM.synthetic_media(spark, 12)
    out = MM.decode_and_featurize(media)
    rows = out.collect()
    assert len(rows) == 12
    assert all(len(r.feature) == 8 for r in rows)
    assert all(len(r.sha256) == 64 for r in rows)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in MM.decode_and_featurize(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)

def test_strict_mode_surfaces_stub(spark):
    media = MM.synthetic_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|codec decode"):
        MM.decode_and_featurize(media, strict=True).collect()

def test_frame_sampling_rows(spark):
    media = MM.synthetic_media(spark, 12)
    frames = MM.sample_frames(media, every_ms=1000, max_frames=4).collect()
    # only video rows explode; every frame row carries its timestamp
    assert frames and all(f.frame_ms == f.frame_idx * 1000 for f in frames)
    vids = {f.media_id for f in frames}
    assert all(mid % 3 == 2 for mid in vids)  # synthetic: i%3==2 → video

def test_media_summary_sql_only(spark):
    media = MM.synthetic_media(spark, 12)
    summ = {(r.modality, r.codec): r.n_items for r in MM.media_summary(media).collect()}
    assert summ == {("image", "png"): 4, ("audio", "wav"): 4, ("video", "mp4"): 4}
