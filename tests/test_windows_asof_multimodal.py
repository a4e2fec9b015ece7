"""Window/top-k/session/as-of/multimodal operator tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from commerce_logs_pipeline_spark.operators import asof, windows
from commerce_logs_pipeline_spark.sources.multimodal import (
    extract_image_features,
    frame_sample_plan,
    synth_media,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def test_topk_two_phase_equals_window(spark):
    df = spark.createDataFrame(
        [(g, i, float((i * 37) % 100)) for g in ["a", "b", "c"] for i in range(50)],
        "grp string, id int, score double",
    )
    a = windows.topk_per_group(df, ["grp"], "score", 5, tiebreak="id",
                               two_phase=True)
    b = windows.topk_per_group(df, ["grp"], "score", 5, tiebreak="id",
                               two_phase=False)
    cols = ["grp", "id", "score"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
    assert a.count() == 15


def test_topk_two_phase_string_and_timestamp_order(spark):
    """Non-numeric order columns: string falls back to the window path;
    timestamp uses the invertible-key fast path. Both must match the
    window reference exactly."""
    rows = [
        ("g1", i, chr(ord("a") + (i * 7) % 26), _ts((i * 13) % 300))
        for i in range(40)
    ] + [("g2", i, "zz", _ts(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, id int, s string, t timestamp")
    for order_col in ["s", "t"]:
        for asc in [True, False]:
            a = windows.topk_per_group(df, ["grp"], order_col, 3,
                                       ascending=asc, tiebreak="id",
                                       two_phase=True)
            b = windows.topk_per_group(df, ["grp"], order_col, 3,
                                       ascending=asc, tiebreak="id",
                                       two_phase=False)
            cols = ["grp", "id", "s", "t"]
            assert a.select(cols).exceptAll(b.select(cols)).count() == 0, (
                order_col, asc)
            assert b.select(cols).exceptAll(a.select(cols)).count() == 0, (
                order_col, asc)


def test_topk_two_phase_null_order_parity(spark):
    """Nulls in the order column: desc -> nulls last, asc -> nulls first,
    matching row_number() semantics on both paths."""
    rows = [("g", 1, 5.0), ("g", 2, None), ("g", 3, 1.0), ("g", 4, None),
            ("g", 5, 9.0)]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    for asc in [True, False]:
        a = windows.topk_per_group(df, ["grp"], "v", 3, ascending=asc,
                                   tiebreak="id", two_phase=True)
        b = windows.topk_per_group(df, ["grp"], "v", 3, ascending=asc,
                                   tiebreak="id", two_phase=False)
        assert sorted((r.id, r.v) for r in a.collect()) == sorted(
            (r.id, r.v) for r in b.collect()
        ), asc


def test_topk_bigint_extremes_no_overflow(spark):
    """Long.MIN_VALUE in a descending two-phase top-k: arithmetic negation
    would raise ARITHMETIC_OVERFLOW under ANSI; the bitwise-NOT key must
    not — and must stay on the two-phase (non-window) path."""
    lo, hi = -(2 ** 63), 2 ** 63 - 1
    rows = [("g", 1, lo), ("g", 2, hi), ("g", 3, 0), ("g", 4, -5), ("g", 5, 7)]
    df = spark.createDataFrame(rows, "grp string, id int, v bigint")
    for asc in [True, False]:
        a = windows.topk_per_group(df, ["grp"], "v", 2, ascending=asc,
                                   tiebreak="id", two_phase=True)
        assert "Window" not in a._jdf.queryExecution().executedPlan().toString()
        b = windows.topk_per_group(df, ["grp"], "v", 2, ascending=asc,
                                   tiebreak="id", two_phase=False)
        assert sorted((r.id, r.v) for r in a.collect()) == sorted(
            (r.id, r.v) for r in b.collect()
        ), asc


def test_topk_double_nan_parity(spark):
    """NaN order columns: Spark sorts NaN greatest. Descending double
    negates NaN to NaN (would sort it last instead of first), so that case
    must fall back to the window path; ascending stays two-phase. Both
    must match the window reference."""
    nan = float("nan")
    rows = [("g", 1, 5.0), ("g", 2, nan), ("g", 3, 1.0), ("g", 4, nan),
            ("g", 5, 9.0), ("g", 6, None)]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    for asc in [True, False]:
        a = windows.topk_per_group(df, ["grp"], "v", 3, ascending=asc,
                                   tiebreak="id", two_phase=True)
        b = windows.topk_per_group(df, ["grp"], "v", 3, ascending=asc,
                                   tiebreak="id", two_phase=False)
        assert sorted(r.id for r in a.collect()) == sorted(
            r.id for r in b.collect()
        ), asc


def test_asof_duplicate_timestamps_natural_key(spark):
    """Two left rows with identical (key, ts) must EACH get exactly one
    match when identified by a natural left_id — no merge, no duplication."""
    left = spark.createDataFrame(
        [("k", "e1", _ts(100)), ("k", "e2", _ts(100)), ("k", "e3", _ts(500))],
        "key string, eid string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", "r1", _ts(90)), ("k", "r2", _ts(95)), ("k", "r3", _ts(480))],
        "key string, rid string, rts timestamp",
    )
    out = asof.asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        tolerance_sec=60, direction="backward", tiebreak=["rid"],
        left_id="eid",
    )
    got = {r.eid: r.rid for r in out.collect()}
    assert got == {"e1": "r2", "e2": "r2", "e3": "r3"}
    assert out.count() == 3


def test_sessionize_gap(spark):
    rows = [
        ("u1", _ts(0)), ("u1", _ts(100)), ("u1", _ts(500)),  # gap 400 > 300
        ("u1", _ts(600)), ("u2", _ts(0)),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    s = windows.sessionize(df, "user", "ts", gap_seconds=300)
    got = {(r.user, r.ts.second + r.ts.minute * 60 + r.ts.hour * 3600): r.session_id
           for r in s.collect()}
    assert got[("u1", 0)] == 1 and got[("u1", 100)] == 1
    assert got[("u1", 500)] == 2 and got[("u1", 600)] == 2
    assert got[("u2", 0)] == 1

    stats = windows.session_stats(df, "user", "ts", 300).collect()
    by_key = {(r.user, r.session_id): r for r in stats}
    assert by_key[("u1", 1)].n_events == 2
    assert by_key[("u1", 2)].duration_sec == 100


def test_range_correlate_exact_window(spark):
    left = spark.createDataFrame(
        [("k", 1, _ts(1000))], "key string, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", 10, _ts(940)), ("k", 11, _ts(1060)), ("k", 12, _ts(1061)),
         ("k", 13, _ts(939)), ("x", 14, _ts(1000))],
        "key string, rid int, rts timestamp",
    )
    out = asof.range_correlate(left, right, ["key"], "ts", "rts",
                               tolerance_sec=60)
    got = sorted(r.rid for r in out.collect())
    assert got == [10, 11]  # exactly within +-60s, same key only


def test_asof_backward_nearest(spark):
    left = spark.createDataFrame(
        [("k", 1, _ts(1000)), ("k", 2, _ts(2000))],
        "key string, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", 10, _ts(900)), ("k", 11, _ts(990)), ("k", 12, _ts(1500))],
        "key string, rid int, rts timestamp",
    )
    out = asof.asof_join(left, right, ["key"], "ts", "rts",
                         tolerance_sec=600, direction="backward",
                         tiebreak=["rid"])
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {1: 11, 2: 12}  # nearest at-or-before within tolerance


def test_latest_per_key_generic(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"), ("b", 1, "w")],
        "k string, v int, payload string",
    )
    out = windows.latest_per_key(df, ["k"], [F.desc("v")])
    got = {r.k: r.payload for r in out.collect()}
    assert got == {"a": "y", "b": "w"}


def test_paginate(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id int")
    got = [r.id for r in windows.paginate(df, [F.asc("id")], 10, 5).collect()]
    assert got == [10, 11, 12, 13, 14]


def test_multimodal_image_features(spark):
    media = synth_media(spark, 48)
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 16  # every 3rd synthetic row is an image
    for r in rows:
        assert len(r.content_sha) == 64
        assert r.n_bytes > 0
        assert 0 <= r.feat_mean <= 255
        assert (r.resized_w, r.resized_h) == (224, 224)
    # deterministic: same input -> same features
    again = {r.media_id: r.feat_mean for r in extract_image_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == r.feat_mean


def test_multimodal_frame_sampling(spark):
    media = synth_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    assert all(r.frame_ts_ms % 1000 == 0 for r in rows)
    per_video = {}
    for r in rows:
        per_video.setdefault(r.media_id, []).append(r.frame_ts_ms)
    durations = {r.media_id: r.duration_ms for r in media.filter(
        "kind = 'video'").collect()}
    for mid, ts_list in per_video.items():
        assert len(ts_list) == durations[mid] // 1000 + 1


def test_multimodal_audio_features(spark):
    from commerce_logs_pipeline_spark.sources.multimodal import (
        extract_audio_features,
    )

    media = synth_media(spark, 30)
    rows = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert len(rows) == 10  # i % 3 == 1
    for r in rows.values():
        assert r.n_bytes % 16 == 0 and r.duration_ms > 0
        assert abs(r.bytes_per_sec - r.n_bytes * 1000.0 / r.duration_ms) == 0
        assert 0.0 <= r.amp_mean <= 255.0


def test_multimodal_audio_null_duration(spark):
    """A null duration_ms must yield a null byterate, not crash the task
    (pandas Int64 nulls are pd.NA, whose truthiness raises)."""
    from commerce_logs_pipeline_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    media = spark.createDataFrame(
        [
            ("a-null", "audio", "audio/wav", b"\x01\x02\x03\x04", None, None, None),
            ("a-ok", "audio", "audio/wav", b"\x05\x06\x07\x08", None, None, 2000),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert rows["a-null"].bytes_per_sec is None
    assert rows["a-null"].duration_ms is None
    assert rows["a-ok"].bytes_per_sec == 4 * 1000.0 / 2000


def test_multimodal_video_frame_windows(spark):
    """Each planned frame carries the deterministic 8-byte window a codec
    frame buffer would occupy — verified against a pure-Python rederivation
    of the construction."""
    import hashlib

    from commerce_logs_pipeline_spark.sources.multimodal import (
        extract_video_frames,
        synth_media,
    )

    rows = extract_video_frames(synth_media(spark, 12)).collect()
    assert rows, "videos exist at i % 3 == 2"
    for r in rows:
        i = int(r.media_id.split("-")[1])
        content = hashlib.md5(f"media-{i}".encode()).digest() * (i % 7 + 1)
        assert r.n_bytes == len(content)
        idx = r.frame_ts_ms // 1000
        start = (idx * 7) % max(len(content) - 7, 1)
        assert r.frame_hex == content[start:start + 8].hex()
    # grid completeness: one row per 1000ms step incl. 0 and <=duration
    per_video = {}
    for r in rows:
        per_video.setdefault(r.media_id, []).append(r.frame_ts_ms)
    for mid, ts_list in per_video.items():
        i = int(mid.split("-")[1])
        assert sorted(ts_list) == list(range(0, 3000 + i * 17 + 1, 1000))


def test_multimodal_real_pil_decode(spark):
    """Optional-dependency path: with pillow importable the decode is REAL
    (open -> resize -> grayscale stats); without it, a clear ImportError.
    Skipped where PIL is absent (this container) — the plumbing is still
    covered by the deterministic-fake tests."""
    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from commerce_logs_pipeline_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )

    buf = io.BytesIO()
    Image.new("RGB", (8, 6), color=(10, 200, 30)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [("m-1", "image", "image/png", buf.getvalue(), 8, 6, None)],
        MEDIA_SCHEMA,
    )
    row = extract_image_features(
        media, target=(4, 4), deterministic_fake=False
    ).collect()[0]
    # solid color -> zero variance after grayscale+resize
    assert row.resized_w == 4 and row.feat_std < 1e-6


def test_multimodal_pil_absent_raises(spark):
    import pytest

    from commerce_logs_pipeline_spark.sources import multimodal as mm

    if mm.pil_available():
        pytest.skip("pillow installed; absence path not testable")
    with pytest.raises(ImportError, match="pillow"):
        mm.extract_image_features(synth_media(spark, 6),
                                  deterministic_fake=False)
