"""Fixed StructTypes for every stage of the pipeline.

Reference parity (cited file:line are in /root/reference):
- transcript input shape: BASELINE.json input_hint (conv_id, turn_idx, role,
  text, tool, ts).
- raw-line union schema: pipeline/events/extraction.go:8-64 (Format 1
  ``Logs``/``kubernetes``; Format 2 container ``@timestamp``/``log``).
- typed outputs: HTTPRequestLog extraction.go:67-91, ApplicationLog :94-118,
  ProxyLog :161-203, ExtractionError :136-151, LogSource :121-133.
- blob-state manifest analog: events/blob.go:58-82 (BlobStateEvent).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: multi-turn transcript table (the payload we re-host the pipeline on)
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Raw-line schema-on-read (Format 1: structured app/access log)
# extraction.go:26-58 — union-by-presence; every field nullable; contextMap
# as map<string,string> so dynamic-typed values (extractor.go:314-357) arrive
# as token text and are coerced by Column casts, not per-row Python.
# ---------------------------------------------------------------------------
RAW_INSTANT = T.StructType(
    [
        T.StructField("epochSecond", T.LongType(), True),
        T.StructField("nanoOfSecond", T.LongType(), True),
    ]
)

RAW_LOGS_FMT1 = T.StructType(
    [
        # HTTP contextMap dialect (extraction.go:28-29). Typed as a STRUCT
        # of exactly the keys the kernel consumes, not map<string,string>:
        # a map parse allocates per-entry and every contains/lookup is a
        # linear scan — measured 3x slower classifier evaluation on the
        # 4M-turn corpus. Dynamic-typed values (number-or-string,
        # extractor.go:314-357) still arrive as token text (Jackson
        # renders any scalar into a StringType field) and are coerced by
        # Column casts. Presence semantics: key-present-with-JSON-null
        # now reads as absent (the Go map presence check would see it) —
        # no wire producer emits that shape.
        T.StructField("timeMillis", T.LongType(), True),
        T.StructField(
            "contextMap",
            T.StructType(
                [
                    T.StructField(k, T.StringType(), True)
                    for k in [
                        "requestLine", "statusCode", "bytesSent",
                        "processMillis", "remoteHost", "sourceClassName",
                        "sourceMethodName",
                    ]
                ]
            ),
            True,
        ),
        # log4j2 application dialect (extraction.go:46-51)
        T.StructField("instant", RAW_INSTANT, True),
        T.StructField("level", T.StringType(), True),
        T.StructField("loggerName", T.StringType(), True),
        T.StructField("thread", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        # string-or-object union (extraction.go:51) -> raw token text
        T.StructField("thrown", T.StringType(), True),
    ]
)

RAW_KUBERNETES = T.StructType(
    [
        T.StructField("pod_name", T.StringType(), True),
        T.StructField("pod_ip", T.StringType(), True),
    ]
)

FMT1_SCHEMA = T.StructType(
    [
        T.StructField("Logs", RAW_LOGS_FMT1, True),
        T.StructField("kubernetes", RAW_KUBERNETES, True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

# Apache access/proxy dialect lives under lowercase ``logs`` in our payload
# corpus (FIXTURES.md §2b), flat string fields (extraction.go:32-43; note the
# literal space in the JSON key "cache status").
# Schema-on-read is PRUNED to the fields the parse kernel actually consumes:
# from_json allocates one object per schema field per row, so dead width is
# pure DRAM traffic in the hottest map stage (wire keys the corpus carries
# but nothing reads — identdUsername, stream, _p, record_date — are
# deliberately absent; Jackson skips unknown keys without materializing).
RAW_LOGS_APACHE = T.StructType(
    [
        T.StructField("requestFirstLine", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("remoteHost", T.StringType(), True),
        T.StructField("responseTime", T.StringType(), True),
        T.StructField("bytes", T.StringType(), True),
        T.StructField("localServerName", T.StringType(), True),
        T.StructField("remoteUser", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("referer", T.StringType(), True),
        T.StructField("userAgent", T.StringType(), True),
        T.StructField("cache status", T.StringType(), True),
    ]
)

# Format 2: container log (extraction.go:14-23) + apache wrapper.
# _corrupt_record: with the fmt1 pass gated off obviously-fmt2 lines
# (functions/parse.py), malformed fmt2-like JSON must still surface as
# "invalid JSON" through THIS parse's corrupt column.
FMT2_SCHEMA = T.StructType(
    [
        T.StructField("@timestamp", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("log", T.StringType(), True),
        T.StructField("logs", RAW_LOGS_APACHE, True),
        T.StructField("kubernetes", RAW_KUBERNETES, True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

# NOTE: the two wire formats are parsed with SEPARATE from_json passes
# (functions/parse.py). A merged superset struct would carry both "Logs"
# (fmt1) and "logs" (apache); field access by name on such a struct is
# AMBIGUOUS_REFERENCE_TO_FIELDS under the default spark.sql.caseSensitive
# =false, so no merged schema exists on purpose.

# ---------------------------------------------------------------------------
# Typed outputs — one superset "parsed" frame with a category discriminator
# (idiomatic Spark router; SURVEY §1.4) instead of a Go tagged union.
# ---------------------------------------------------------------------------
# HTTPRequestLog extraction.go:67-91
HTTP_FIELDS = [
    T.StructField("ts_ns", T.LongType(), True),
    T.StructField("method", T.StringType(), True),
    T.StructField("path", T.StringType(), True),
    T.StructField("protocol", T.StringType(), True),
    T.StructField("status_code", T.IntegerType(), True),
    T.StructField("response_time_ms", T.LongType(), True),
    T.StructField("bytes_sent", T.LongType(), True),
    T.StructField("client_ip", T.StringType(), True),
    T.StructField("pod_name", T.StringType(), True),
]

# ApplicationLog extraction.go:94-118
APP_FIELDS = [
    T.StructField("level", T.StringType(), True),
    T.StructField("logger", T.StringType(), True),
    T.StructField("thread", T.StringType(), True),
    T.StructField("msg", T.StringType(), True),
    T.StructField("thrown", T.StringType(), True),
]

# ProxyLog extras extraction.go:161-203
PROXY_FIELDS = [
    T.StructField("local_server_name", T.StringType(), True),
    T.StructField("remote_user", T.StringType(), True),
    T.StructField("referer", T.StringType(), True),
    T.StructField("user_agent", T.StringType(), True),
    T.StructField("cache_status", T.StringType(), True),
    T.StructField("pod_ip", T.StringType(), True),
]

# Tool-invocation fields (transcript-native dialect, FIXTURES.md §2e)
TOOL_FIELDS = [
    T.StructField("tool_name", T.StringType(), True),
    T.StructField("tool_status", T.IntegerType(), True),
    T.StructField("tool_latency_ms", T.LongType(), True),
    T.StructField("tool_args_bytes", T.LongType(), True),
]

# ExtractionError extraction.go:136-151 (dead-letter)
ERROR_FIELDS = [
    T.StructField("parse_error", T.StringType(), True),
    T.StructField("error_type", T.StringType(), True),
]

PARSED_EXTRA_FIELDS = (
    [T.StructField("category", T.StringType(), False)]
    + HTTP_FIELDS
    + APP_FIELDS
    + PROXY_FIELDS
    + TOOL_FIELDS
    + ERROR_FIELDS
)

PARSED_SCHEMA = T.StructType(list(TRANSCRIPT_SCHEMA.fields) + PARSED_EXTRA_FIELDS)

# Router categories, in routing-priority order (SURVEY §2.2 F5 + §7.2 step 5).
CATEGORIES = [
    "skipped",          # F5 silent drops — counted as success (service.go:232-235)
    "parse_error",      # dead-letter (S6)
    "error",            # app-level ERROR/FATAL with thrown — errors sink
    "tool_call",        # transcript-native tool invocation
    "proxy",            # ProxyLog (proxy_service.go)
    "http",             # HTTPRequestLog
    "app",              # ApplicationLog
    "container",        # Format-2 free-text container line
    "user_turn",        # plain conversational turns
    "assistant_turn",
]

# ---------------------------------------------------------------------------
# Checkpoint/lineage manifest — BlobStateEvent analog (events/blob.go:58-82):
# status latch, monotonic watermark, running counts, first/last seen.
# Keyed by (day, bucket) instead of sub:env:blobName.
# ---------------------------------------------------------------------------
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("day", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # open|closed latch
        T.StructField("max_turn_watermark", T.LongType(), True),
        T.StructField("rows_processed", T.LongType(), True),
        T.StructField("rows_routed", T.LongType(), True),
        T.StructField("rows_skipped", T.LongType(), True),
        T.StructField("rows_error", T.LongType(), True),
        T.StructField("first_processed_ts", T.TimestampType(), True),
        T.StructField("last_processed_ts", T.TimestampType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        # Self-contained runs only (compact/full prefix): the wall-clock
        # instant the run READ its sources. Supersession is ordered by
        # this, not by commit time — a chunk that commits while a
        # compaction is in flight (after the compactor read the manifest,
        # before it committed) keeps a later boundary and stays visible
        # instead of being silently hidden and vacuum-deleted (lost
        # update). Null on chunk events and on pre-r5 manifest files
        # (explicit read schema -> nulls; visible_runs falls back to
        # updated_at).
        T.StructField("superseded_asof", T.TimestampType(), True),
    ]
)

# Enrichment dims (FIXTURES.md §3)
ROLE_DIM_ROWS = [
    ("user", "human", True),
    ("assistant", "model", True),
    ("system", "infra", False),
    ("tool", "infra", False),
]
ROLE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), False),
        T.StructField("role_class", T.StringType(), False),
        T.StructField("is_billable", T.BooleanType(), False),
    ]
)

# tool_dim — analog of the selector registry (selectors.go:84-186): each tool
# maps to a category + service name the way each selector maps to a topic.
TOOL_DIM_ROWS = [
    ("search", "retrieval", "api", 30000),
    ("code_exec", "execution", "background-processing", 120000),
    ("fetch", "io", "apache-proxy", 15000),
    ("db_query", "io", "backoffice", 60000),
    ("summarize", "execution", "jsapps", 45000),
    ("translate", "execution", "imageprocessing", 45000),
]
TOOL_DIM_SCHEMA = T.StructType(
    [
        T.StructField("tool", T.StringType(), False),
        T.StructField("tool_category", T.StringType(), False),
        T.StructField("service_name", T.StringType(), False),
        T.StructField("timeout_ms", T.IntegerType(), False),
    ]
)
