"""Scene-change detection + keyframe selection over decoded video
frames — the frame-sampling pass a vision-language training pipeline
runs so it trains on one frame per shot instead of 24 near-identical
frames per second.

Input is the decoded frame table (`multimodal.video_frame_rows` /
`gif_frame_rows` schema: media_id, frame_idx, ts_ms, width, height,
channels, pixels). The change statistic is the mean absolute pixel
difference vs the previous frame, reported as integer PERMILLE of
the 0-255 range (``sad * 1000 // (npix * 255)``) — exact integer
arithmetic, so results are identical under any partitioning and any
arithmetic backend (the lesson every oracle key here re-learned:
floats drift, integers don't).

Scale shape: one ``applyInPandas`` group per media id — a video's
frames co-locate in one task, bounded by the decoder's
``max_frames`` cap, the sessionize posture; across media the work is
embarrassingly parallel. Frames that disagree on geometry with their
predecessor (resolution change mid-stream) are scene changes by
definition and get the sentinel diff 1000."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

FRAME_DIFF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("diff_pm", LongType()),
    ]
)


def frame_diffs(frames: DataFrame) -> DataFrame:
    """(media_id, frame_idx, ts_ms, diff_pm) per frame: mean absolute
    difference vs the previous frame in frame_idx order, integer
    permille of full scale. The first frame of each media has NULL
    diff_pm (nothing to compare against — callers treat it as a
    scene start)."""
    import pandas as pd

    def per_media(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("frame_idx")
        out_idx, out_ts, out_pm = [], [], []
        prev = None
        prev_shape = None
        for _, r in pdf.iterrows():
            w, h, ch = int(r.width), int(r.height), int(r.channels)
            buf = bytes(r.pixels or b"")
            n = w * h * ch
            if n <= 0 or len(buf) < n:
                continue
            cur = np.frombuffer(buf[:n], dtype=np.uint8).astype(np.int64)
            if prev is None:
                pm = None
            elif prev_shape != (w, h, ch):
                pm = 1000  # geometry change = new scene by definition
            else:
                sad = int(np.abs(cur - prev).sum())
                pm = sad * 1000 // (n * 255)
            out_idx.append(int(r.frame_idx))
            out_ts.append(int(r.ts_ms))
            out_pm.append(pm)
            prev, prev_shape = cur, (w, h, ch)
        mid = int(pdf["media_id"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "media_id": pd.array([mid] * len(out_idx), dtype="int64"),
                "frame_idx": pd.array(out_idx, dtype="int64"),
                "ts_ms": pd.array(out_ts, dtype="int64"),
                "diff_pm": pd.array(out_pm, dtype="Int64"),
            }
        )

    return frames.groupBy("media_id").applyInPandas(
        per_media, FRAME_DIFF_SCHEMA
    )


def scene_changes(frames: DataFrame, threshold_pm: int = 60) -> DataFrame:
    """Frames that OPEN a scene: the first frame of each media plus
    every frame whose diff_pm >= threshold_pm."""
    d = frame_diffs(frames)
    return d.filter(
        F.col("diff_pm").isNull() | (F.col("diff_pm") >= threshold_pm)
    )


def keyframes(
    frames: DataFrame, threshold_pm: int = 60
) -> DataFrame:
    """One representative frame per detected scene: the scene-opening
    frame itself, with full pixel payload — join the scene starts
    back to the frame table. The VLM-training frame-sampling output."""
    starts = scene_changes(frames, threshold_pm).select(
        "media_id", "frame_idx"
    )
    return frames.join(starts, ["media_id", "frame_idx"])


def stream_frame_diffs(frames: DataFrame) -> DataFrame:
    """Live scene statistics — the streaming twin of
    :func:`frame_diffs` (25th parity surface, completing the
    modality set: audio features 18th, image hashes 20th, video
    25th): frames arrive in frame_idx order per media (the decoder
    emits them that way); state per media is the PREVIOUS frame's
    geometry + pixel buffer, so each arriving frame emits its
    diff_pm immediately and state stays O(one frame). For an
    in-order feed the output equals batch frame_diffs exactly across
    any micro-batch split — the diff is a pure function of
    (previous frame, current frame), both integer arithmetic."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("w", LongType()),
            StructField("h", LongType()),
            StructField("ch", LongType()),
            StructField("px", BinaryType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np

        if state.exists:
            sw, sh, sch, spx = state.get
            prev_shape = (int(sw), int(sh), int(sch))
            prev = np.frombuffer(bytes(spx), dtype=np.uint8).astype(
                np.int64
            )
        else:
            prev_shape, prev = None, None
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "diff_pm": []}
        for pdf in pdfs:
            pdf = pdf.sort_values("frame_idx")
            for _, r in pdf.iterrows():
                w, h, ch = int(r.width), int(r.height), int(r.channels)
                buf = bytes(r.pixels or b"")
                n = w * h * ch
                if n <= 0 or len(buf) < n:
                    continue
                cur = np.frombuffer(buf[:n], dtype=np.uint8).astype(
                    np.int64
                )
                if prev is None:
                    pm = None
                elif prev_shape != (w, h, ch):
                    pm = 1000
                else:
                    sad = int(np.abs(cur - prev).sum())
                    pm = sad * 1000 // (n * 255)
                out["media_id"].append(int(key[0]))
                out["frame_idx"].append(int(r.frame_idx))
                out["ts_ms"].append(int(r.ts_ms))
                out["diff_pm"].append(pm)
                prev, prev_shape = cur, (w, h, ch)
        if prev is not None:
            state.update(
                (
                    prev_shape[0],
                    prev_shape[1],
                    prev_shape[2],
                    bytes(np.asarray(prev, dtype=np.int64).astype(np.uint8)),
                )
            )
        if out["media_id"]:
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int64"),
                    "ts_ms": pd.array(out["ts_ms"], dtype="int64"),
                    "diff_pm": pd.array(out["diff_pm"], dtype="Int64"),
                }
            )

    return frames.groupBy("media_id").applyInPandasWithState(
        update,
        outputStructType=FRAME_DIFF_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
