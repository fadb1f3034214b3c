"""resize_images + sample_frames: transform semantics on the fake
formats, pass-through behavior, and the map-only plan shape."""

from __future__ import annotations

import struct

from osmgraft.operators.multimodal import (
    decode_metadata,
    resize_images,
    sample_frames,
    synth_media,
    synth_video,
)


def test_resize_scales_large_keeps_small(spark):
    media = synth_media(spark, 40)
    before = {
        r.doc_id: (r.width, r.height)
        for r in decode_metadata(media)
        .filter("kind = 'image'")
        .collect()
    }
    after = {
        r.doc_id: (r.width, r.height)
        for r in decode_metadata(resize_images(media, max_dim=64))
        .filter("kind = 'image'")
        .collect()
    }
    assert set(after) == set(before)
    for did, (w, h) in before.items():
        nw, nh = after[did]
        if max(w, h) <= 64:
            assert (nw, nh) == (w, h)
        else:
            m = max(w, h)
            assert (nw, nh) == (
                max(1, w * 64 // m),
                max(1, h * 64 // m),
            )
            assert max(nw, nh) <= 64


def test_resize_passes_audio_untouched(spark):
    media = synth_media(spark, 20)
    raw = {
        r.doc_id: bytes(r.payload)
        for r in media.filter("kind = 'audio'").collect()
    }
    out = {
        r.doc_id: bytes(r.payload)
        for r in resize_images(media)
        .filter("kind = 'audio'")
        .collect()
    }
    assert out == raw


def test_sample_frames_offsets_and_bytes(spark):
    vids = synth_video(spark, 30)
    frames = sample_frames(vids, every_n=4).collect()
    assert frames
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rows in by_doc.items():
        n_frames = 4 + (did * 3) % 28
        frame_len = 8 + did % 16
        assert [r.frame_idx for r in sorted(
            rows, key=lambda r: r.frame_idx
        )] == list(range(0, n_frames, 4))
        for r in rows:
            f = bytes(r.frame)
            assert len(f) == frame_len
            assert set(f) == {(did + r.frame_idx) % 256}


def test_transforms_are_map_only(spark):
    media = synth_media(spark, 10)
    plan = (
        resize_images(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    plan2 = (
        sample_frames(synth_video(spark, 10))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan2
