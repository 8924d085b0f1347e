"""Scene-change detection / keyframe selection (pipeline/scenes.py):
integer-permille frame diffs, threshold semantics, geometry-change
sentinel, and an end-to-end run from a real DIB AVI through
video_frame_rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.scenes import frame_diffs, keyframes, scene_changes


def _frames(spark, rows):
    from openset_spark.pipeline.multimodal import GIF_FRAME_SCHEMA

    return spark.createDataFrame(
        [
            (mid, idx, ts, w, h, ch, bytearray(px))
            for mid, idx, ts, w, h, ch, px in rows
        ],
        GIF_FRAME_SCHEMA,
    )


def test_frame_diffs_exact_integer_permille(spark):
    # 2x1 gray frames: [0,0] -> [51,51] is a mean abs diff of 51/255
    # = exactly 200 permille; identical frames diff 0
    rows = [
        (1, 0, 0, 2, 1, 1, bytes([0, 0])),
        (1, 1, 100, 2, 1, 1, bytes([51, 51])),
        (1, 2, 200, 2, 1, 1, bytes([51, 51])),
    ]
    out = {
        r.frame_idx: r.diff_pm
        for r in frame_diffs(_frames(spark, rows)).collect()
    }
    assert out == {0: None, 1: 200, 2: 0}


def test_scene_changes_and_keyframes(spark):
    flat = bytes([10] * 12)
    shifted = bytes([11] * 12)   # diff 1/255 ~ 3 pm: below threshold
    other = bytes([200] * 12)    # big jump
    rows = [
        (7, 0, 0, 4, 1, 3, flat),
        (7, 1, 40, 4, 1, 3, shifted),
        (7, 2, 80, 4, 1, 3, other),     # scene change
        (7, 3, 120, 4, 1, 3, other),
        (7, 4, 160, 4, 1, 3, flat),     # scene change back
        # second media: single frame = its own scene
        (8, 0, 0, 4, 1, 3, flat),
    ]
    starts = {
        (r.media_id, r.frame_idx)
        for r in scene_changes(_frames(spark, rows), 60).collect()
    }
    assert starts == {(7, 0), (7, 2), (7, 4), (8, 0)}
    kf = keyframes(_frames(spark, rows), 60)
    got = {
        (r.media_id, r.frame_idx): bytes(r.pixels) for r in kf.collect()
    }
    assert set(got) == starts
    assert got[(7, 2)] == other and got[(7, 4)] == flat


def test_geometry_change_is_scene_sentinel(spark):
    rows = [
        (3, 0, 0, 2, 1, 1, bytes([5, 5])),
        (3, 1, 50, 1, 2, 1, bytes([5, 5])),  # same bytes, new shape
    ]
    out = {
        r.frame_idx: r.diff_pm
        for r in frame_diffs(_frames(spark, rows)).collect()
    }
    assert out[1] == 1000


def test_keyframes_from_real_avi(spark):
    """End to end: a DIB AVI whose frames switch pattern halfway must
    yield exactly two keyframes through the real decode path."""
    from openset_spark.pipeline.multimodal import MEDIA_SCHEMA, video_frame_rows
    from tests.test_avi import _avi_bytes

    w, h = 8, 6

    def dib(rgb):
        r, g, b = rgb
        row = bytes([b, g, r]) * w  # 24 bytes, already 4-aligned
        return row * h  # bottom-up irrelevant for constant frames

    a, bfr = dib((10, 20, 30)), dib((200, 100, 50))
    payload = _avi_bytes(
        [(b"db", a), (b"db", a), (b"db", bfr), (b"db", bfr)],
        w,
        h,
        handler=b"DIB ",
        compression=b"DIB ",
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        MEDIA_SCHEMA,
    )
    frames = video_frame_rows(media)
    kf = sorted(
        r.frame_idx for r in keyframes(frames, 60).collect()
    )
    assert kf == [0, 2]
