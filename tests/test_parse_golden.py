"""Golden parse cases ported from the reference's table-driven parser tests
(/root/reference/pipeline/extraction/internal/extractor/extractor_test.go):
each verbatim-style payload line must yield the exact typed record the Go
extractor produces (SURVEY §5). All cases are parsed in ONE Spark job via a
module fixture; individual tests assert on the collected rows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from commerce_logs_pipeline_spark.functions.parse import parse_transcripts
from commerce_logs_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

TS = dt.datetime(2024, 1, 1, 0, 0, 0)

# extractor_test.go:16-30 — contextMap HTTP line
HTTP_LINE = (
    '{"Logs":{"timeMillis":1734243648463,"contextMap":{'
    '"requestLine":"GET /api/test HTTP/1.1","statusCode":200,'
    '"bytesSent":4538,"processMillis":71,"remoteHost":"10.20.30.152"}},'
    '"kubernetes":{"pod_name":"api-5f7d8c9b4d-x7k2p"}}'
)

# extractor_test.go:56-70, 204-219 — log4j2 app line with thrown
APP_LINE = (
    '{"Logs":{"instant":{"epochSecond":1734243648,"nanoOfSecond":463000000},'
    '"level":"ERROR","loggerName":"com.api.PaymentService",'
    '"thread":"http-nio-8080-exec-5","message":"Payment processing failed",'
    '"thrown":"java.lang.RuntimeException: Payment gateway timeout"},'
    '"kubernetes":{"pod_name":"api-payment-abc123-def456"}}'
)

# FIXTURES.md §2b — apache access/proxy line
PROXY_LINE = (
    '{"@timestamp":"2025-06-15T18:14:04.948924Z","logs":{'
    '"localServerName":"localhost","remoteHost":"127.0.0.1",'
    '"requestFirstLine":"GET /healthz HTTP/1.1","responseTime":"0",'
    '"status":"204","bytes":"-","referer":"-","userAgent":"kube-probe/1.31",'
    '"cache status":"-","remoteUser":"-","identdUsername":"-",'
    '"time":"[15/Jun/2025:18:14:04 +0000]"},'
    '"kubernetes":{"pod_name":"apache2-igc-9db94ff4f-xzl59","pod_ip":"10.244.1.16"}}'
)

# extractor_test.go:444-454 — container free-text line
CONTAINER_LINE = (
    '{"@timestamp":"2025-06-13T12:11:57.259321Z","stream":"stderr",'
    '"log":"INFO: property name: ccv2.additional.catalina.opts",'
    '"time":"2025-06-13T12:11:57.259321544Z",'
    '"kubernetes":{"pod_name":"api-869d548fdb-8hzh7"}}'
)

STANDARD = ["GET", "HEAD", "POST", "PUT", "DELETE", "CONNECT", "OPTIONS",
            "TRACE", "PATCH"]

CASES: dict[str, tuple[str, str]] = {  # id -> (text, role)
    "http": (HTTP_LINE, "system"),
    "http_status_str": (HTTP_LINE.replace('"statusCode":200', '"statusCode":"200"'),
                        "system"),
    "http_status_float": (HTTP_LINE.replace('"statusCode":200', '"statusCode":200.0'),
                          "system"),
    "app_error": (APP_LINE, "system"),
    # extractor.go:463-477 — thrown may be a JSON OBJECT; the extractor
    # re-marshals it to its serialized text
    "app_error_obj_thrown": (
        APP_LINE.replace(
            '"thrown":"java.lang.RuntimeException: Payment gateway timeout"',
            '"thrown":{"name":"java.lang.RuntimeException",'
            '"message":"Payment gateway timeout"}',
        ),
        "system",
    ),
    "app_info": (
        APP_LINE.replace('"level":"ERROR"', '"level":"INFO"').replace(
            ',"thrown":"java.lang.RuntimeException: Payment gateway timeout"', ""
        ),
        "system",
    ),
    "proxy": (PROXY_LINE, "system"),
    "container": (CONTAINER_LINE, "system"),
    "container_no_level": (
        CONTAINER_LINE.replace(
            "INFO: property name: ccv2.additional.catalina.opts",
            "no level token here",
        ),
        "system",
    ),
    "container_warn_lower": (CONTAINER_LINE.replace("INFO:", "warn:"), "system"),
    "tool_call": ("TOOL_CALL tool=search status=200 latency_ms=71 args_bytes=4538",
                  "tool"),
    # skip rules (extractor.go:152-154, :287-311)
    "skip_empty": ("", "user"),
    "skip_spaces": ("   ", "user"),
    "skip_tab": (" \t ", "user"),
    "skip_newline": ("\n", "user"),
    "skip_dash": (HTTP_LINE.replace("GET /api/test HTTP/1.1", "-"), "system"),
    # extractor_test.go:1083-1131
    "skip_rtsp": (
        PROXY_LINE.replace("GET /healthz HTTP/1.1", "DESCRIBE /stream RTSP/1.0"),
        "system",
    ),
    # extractor_test.go:1033-1081
    "skip_method": (
        HTTP_LINE.replace("GET /api/test HTTP/1.1", "SSTP_DUPLEX_POST /sra_x HTTP/1.1"),
        "system",
    ),
    # dead letters (extractor_test.go:283-299)
    "bad_json": ("{invalid json", "system"),
    "no_ts": (
        '{"Logs":{"level":"INFO","loggerName":"x","message":"no ts"},'
        '"kubernetes":{"pod_name":"api-1-2"}}',
        "system",
    ),
    "plain_user": ("hello there", "user"),
    "plain_assistant": ("hi, how can I help", "assistant"),
}
# method whitelist (extractor_test.go:1133-1161, extractor.go:230-243)
for m in STANDARD:
    CASES[f"method_{m}"] = (HTTP_LINE.replace("GET /api/test", f"{m} /api/test"),
                            "system")


@pytest.fixture(scope="module")
def golden(spark) -> dict[str, Row]:
    rows = [
        Row(conv_id=cid, turn_idx=0, role=role, text=text, tool=None, ts=TS)
        for cid, (text, role) in CASES.items()
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    return {r.conv_id: r for r in parse_transcripts(df).collect()}


def test_http_context_map(golden):
    r = golden["http"]
    assert r.category == "http"
    assert r.method == "GET"
    assert r.path == "/api/test"
    assert r.protocol == "HTTP"
    assert r.status_code == 200
    assert r.bytes_sent == 4538
    assert r.response_time_ms == 71
    assert r.client_ip == "10.20.30.152"
    assert r.pod_name == "api-5f7d8c9b4d-x7k2p"
    assert r.ts_ns == 1734243648463 * 1_000_000  # timeMillis*1e6 (extractor.go:250)


def test_http_dynamic_types(golden):
    """statusCode as string / float must coerce (extractor.go:314-357)."""
    assert golden["http_status_str"].status_code == 200
    assert golden["http_status_float"].status_code == 200


def test_app_log4j2_error(golden):
    r = golden["app_error"]
    assert r.category == "error"  # ERROR + thrown -> errors sink
    assert r.level == "ERROR"
    assert r.logger == "com.api.PaymentService"
    assert r.thread == "http-nio-8080-exec-5"
    assert r.msg == "Payment processing failed"
    assert "gateway timeout" in r.thrown
    assert r.ts_ns == 1734243648 * 1_000_000_000 + 463_000_000  # extractor.go:444


def test_app_object_thrown_kept_as_json(golden):
    """Object-form thrown routes to the errors sink with the serialized
    object retained (extractor.go:463-477 re-marshal parity)."""
    import json

    r = golden["app_error_obj_thrown"]
    assert r.category == "error"
    assert json.loads(r.thrown) == {
        "name": "java.lang.RuntimeException",
        "message": "Payment gateway timeout",
    }


def test_app_info_no_thrown(golden):
    r = golden["app_info"]
    assert r.category == "app"
    assert r.level == "INFO"
    assert r.thrown is None


def test_proxy_apache(golden):
    r = golden["proxy"]
    assert r.category == "proxy"
    assert r.method == "GET"
    assert r.path == "/healthz"
    assert r.status_code == 204
    assert r.bytes_sent == 0  # "-" -> 0 (extractor.go:406)
    assert r.response_time_ms == 0
    assert r.local_server_name == "localhost"
    assert r.user_agent == "kube-probe/1.31"
    assert r.cache_status == "-"
    assert r.pod_ip == "10.244.1.16"
    assert r.client_ip == "127.0.0.1"
    expect_us = int(
        dt.datetime(2025, 6, 15, 18, 14, 4, 948924, dt.timezone.utc).timestamp()
        * 1_000_000
    )
    assert r.ts_ns == expect_us * 1000  # RFC3339 -> ns (extractor.go:200-218)


def test_container_line(golden):
    r = golden["container"]
    assert r.category == "container"
    assert r.level == "INFO"
    assert r.msg.startswith("INFO: property name")
    assert r.logger == "api"  # pod -> service regex (extractor.go:24,173-185)
    assert r.pod_name == "api-869d548fdb-8hzh7"


def test_level_default_and_case_insensitive(golden):
    assert golden["container_no_level"].level == "INFO"  # extractor.go:221-227
    assert golden["container_warn_lower"].level == "WARN"


def test_tool_call_grok(golden):
    r = golden["tool_call"]
    assert r.category == "tool_call"
    assert r.tool_name == "search"
    assert r.tool_status == 200
    assert r.tool_latency_ms == 71
    assert r.tool_args_bytes == 4538


def test_skip_rules(golden):
    for cid in ["skip_empty", "skip_spaces", "skip_tab", "skip_newline",
                "skip_dash", "skip_rtsp", "skip_method"]:
        assert golden[cid].category == "skipped", cid


def test_standard_methods_accepted(golden):
    for m in STANDARD:
        assert golden[f"method_{m}"].category == "http", m


def test_dead_letters(golden):
    assert golden["bad_json"].category == "parse_error"
    assert golden["bad_json"].error_type == "parse_error"
    assert golden["no_ts"].category == "parse_error"
    assert golden["no_ts"].error_type == "validation_error"


def test_plain_turns_route_by_role(golden):
    assert golden["plain_user"].category == "user_turn"
    assert golden["plain_assistant"].category == "assistant_turn"


def test_parse_under_default_case_insensitive_session(spark):
    """Regression: the driver's harness runs a DEFAULT session
    (spark.sql.caseSensitive=false). Round 1 crashed there with
    AMBIGUOUS_REFERENCE_TO_FIELDS because a merged raw schema carried both
    "Logs" and "logs". Parse must work with no custom conf at all.
    """
    assert spark.conf.get("spark.sql.caseSensitive") == "false"
    rows = [
        Row(conv_id="a", turn_idx=0, role="system", text=HTTP_LINE, tool=None, ts=TS),
        Row(conv_id="b", turn_idx=0, role="system", text=PROXY_LINE, tool=None, ts=TS),
        Row(conv_id="c", turn_idx=0, role="system", text=APP_LINE, tool=None, ts=TS),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {r.conv_id: r.category for r in parse_transcripts(df).collect()}
    assert got == {"a": "http", "b": "proxy", "c": "error"}


def test_pure_column_engine_matches_pandas_grok(spark, transcripts_10k):
    """Both parse engines (pandas-UDF grok vs pure Column) agree row-for-row."""
    a = parse_transcripts(transcripts_10k, use_pandas_grok=True)
    b = parse_transcripts(transcripts_10k, use_pandas_grok=False)
    cols = ["conv_id", "turn_idx", "category", "tool_name", "tool_status",
            "tool_latency_ms", "tool_args_bytes"]
    assert (
        a.select(cols).exceptAll(b.select(cols)).count() == 0
        and b.select(cols).exceptAll(a.select(cols)).count() == 0
    )
