"""Trace/span assembly (the reference's designed correlator) + JSON field
profiler tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_logs_pipeline_spark.functions.profile import profile_json_fields
from commerce_logs_pipeline_spark.plans.traces import (
    assemble_traces,
    correlate_app_to_spans,
    http_spans,
)


def test_http_spans_shape(spark, parsed_10k):
    spans = http_spans(parsed_10k)
    n_req = parsed_10k.filter(F.col("category").isin("http", "proxy")).count()
    rows = spans.limit(50).collect()
    assert spans.count() == n_req
    for r in rows:
        assert r.kind == "SERVER"
        assert len(r.trace_id) == 32
        assert len(r.span_id) == 16
        assert r.end_time_unix_nano >= r.start_time_unix_nano
        assert r.status_code_otel in ("OK", "ERROR")
        assert r.attributes["http.method"] == r.method


def test_trace_ids_deterministic(spark, parsed_10k):
    a = {(r.trace_id, r.span_id) for r in http_spans(parsed_10k).collect()}
    b = {(r.trace_id, r.span_id) for r in http_spans(parsed_10k).collect()}
    assert a == b  # UUIDv5-style replay stability (trace-model.md:50-57)


def test_assemble_traces_dedup_and_parenting(spark, parsed_10k):
    traces = assemble_traces(parsed_10k, tolerance_sec=60).cache()
    # (trace_id, span_id) unique — the S8 sink doc-id discipline
    assert (
        traces.select("trace_id", "span_id").distinct().count() == traces.count()
    )
    kinds = {r.kind for r in traces.select("kind").distinct().collect()}
    assert kinds <= {"SERVER", "INTERNAL"}
    # every INTERNAL span's parent exists as a SERVER span in the same trace
    children = traces.filter("kind = 'INTERNAL'").select(
        "trace_id", F.col("parent_span_id").alias("span_id")
    )
    servers = traces.filter("kind = 'SERVER'").select("trace_id", "span_id")
    orphans = children.exceptAll(children.join(servers,
                                               ["trace_id", "span_id"],
                                               "left_semi")).count()
    assert orphans == 0
    traces.unpersist()


def test_thread_correlation_beats_time_window(spark):
    """J4: an app event whose thread matches a FARTHER span must attach to
    that span, not the nearer-in-time one (pipeline_design.md:60-64)."""
    import datetime as dt

    from pyspark.sql import Row

    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts
    from commerce_logs_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

    http = (
        '{"Logs":{"timeMillis":%d,"contextMap":{"requestLine":"GET /x HTTP/1.1",'
        '"statusCode":200,"bytesSent":1,"processMillis":1,"remoteHost":"1.2.3.4"},'
        '"thread":"%s"},"kubernetes":{"pod_name":"api-1-2"}}'
    )
    app = (
        '{"Logs":{"instant":{"epochSecond":%d,"nanoOfSecond":0},"level":"INFO",'
        '"loggerName":"L","thread":"%s","message":"m"},'
        '"kubernetes":{"pod_name":"api-1-2"}}'
    )
    t0 = dt.datetime(2024, 1, 1)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        Row(conv_id="c", turn_idx=0, role="system",
            text=http % (1000, "exec-1"), tool=None, ts=at(100)),
        Row(conv_id="c", turn_idx=1, role="system",
            text=app % (2, "exec-2"), tool=None, ts=at(110)),
        Row(conv_id="c", turn_idx=2, role="system",
            text=http % (2000, "exec-2"), tool=None, ts=at(130)),
    ]
    parsed = parse_transcripts(
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    ).cache()
    traces = assemble_traces(parsed, tolerance_sec=60)
    internal = [r for r in traces.collect() if r.kind == "INTERNAL"]
    assert len(internal) == 1  # exactly one parent per app event
    spans = {r.turn_idx: r.span_id for r in http_spans(parsed).collect()}
    # nearest span is turn 0 (gap 10s) but thread matches turn 2 (gap 20s)
    assert internal[0].parent_span_id == spans[2]
    parsed.unpersist()


def test_profile_json_fields(spark, transcripts_10k):
    prof = profile_json_fields(transcripts_10k, "text", sample_rows=500)
    rows = {r.path: r for r in prof.collect()}
    assert "kubernetes" in rows
    assert "kubernetes.pod_name" in rows
    for r in rows.values():
        assert 0 < r.presence <= 1.0
    # Format-1 "Logs" and Format-2 "@timestamp" both appear in the corpus
    assert "Logs" in rows
    assert "@timestamp" in rows
