"""Deterministic synthetic transcript generator.

Builds the input table from BASELINE.json input_hint —
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — entirely with Column expressions over ``spark.range``:
no driver-side data, no ``rand()`` (partitioning-dependent), no per-row
Python. Every value is a pure function of the row id and the seed, so any
two runs (and any two parallelism levels) produce byte-identical tables.

The ``text`` payloads mirror the reference parser's golden inputs
(/root/reference/pipeline/extraction/internal/extractor/extractor_test.go):
HTTP contextMap lines (:16-30), apache access lines (:844), log4j2 app lines
(:56-70), container lines (:444-454), plus the skip-rule rows (:681-1161)
and invalid-JSON dead-letter rows (:283-299). Conversation sizes are
Zipf-skewed so hot-conversation skew handling (north rule) is exercised.

Scale posture: generation is O(rows) with zero driver materialization and a
single window shuffle for dense per-conversation turn indices; at 10^12 rows
the same code runs, just with more range partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEED = 42

# Deterministic per-row uniform in [0,1): splitmix-style integer mix of the
# row id — stable under any partitioning, unlike F.rand(seed).
def _mix(col: Column, salt: int) -> Column:
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(SEED)))


def _uniform(col: Column, salt: int) -> Column:
    return (_mix(col, salt) % F.lit(1_000_000_000)) / F.lit(1_000_000_000.0)


TOOLS = ["search", "code_exec", "fetch", "db_query", "summarize", "translate"]
METHODS = ["GET", "POST", "PUT", "DELETE", "HEAD"]
PATHS = [
    "/api/orders", "/api/cart", "/api/products", "/healthz",
    "/api/checkout", "/medias/img", "/api/customers",
]
STATUS = [200, 200, 200, 201, 204, 301, 404, 500, 503]
LEVELS = ["INFO", "INFO", "INFO", "WARN", "DEBUG", "ERROR"]
LOGGERS = [
    "com.api.PaymentService", "com.api.CartFacade", "org.apache.solr.Core",
    "com.hybris.OrderJob", "de.shop.MediaFilter",
]
PODS = [
    "api-5f7d8c9b4d-x7k2p", "apache2-igc-9db94ff4f-xzl59",
    "backoffice-7b9c44f6d8-q2wls", "background-processing-6d8f9b7c5e-a1b2c",
    "jsapps-58d9f7b6c4-m3n4o", "api-payment-abc123-def456",
]
CHAT = [
    "please check my order status", "the checkout fails with an error",
    "can you summarize the cart contents", "looks good, thanks",
    "I updated the shipping address", "retry the payment please",
]


def _pick(arr: list, col: Column, salt: int) -> Column:
    """Deterministically pick an element of a literal array by hashed id."""
    a = F.array(*[F.lit(x) for x in arr])
    return F.element_at(a, (_mix(col, salt) % len(arr) + 1).cast("int"))


def generate_transcripts(
    spark: SparkSession,
    n_turns: int = 100_000,
    n_convs: int | None = None,
    skew: float = 2.5,
    partitions: int | None = None,
    n_days: int = 30,
    portable: bool = False,
) -> DataFrame:
    """Return a deterministic transcript DataFrame of ``n_turns`` rows.

    ``n_days`` controls the ts span (and thus the day-partition count of
    downstream sinks) — size it to the data volume so partition dirs stay
    meaningful (a 10^12-turn table wants daily partitions; a 1M-row bench
    input wants a handful).

    ``portable=True`` swaps the xxhash64 row mixer for an md5-derived one
    (md5 -> first 15 hex digits -> int) and the float-pow Zipf assignment
    for exact integer math, so an external SQL engine (the driver's DuckDB
    oracle) can reproduce every generated value bit-for-bit. Slower —
    reserve it for oracle-checked corpora; bench/tests use the default.
    """
    if n_convs is None:
        n_convs = max(1, n_turns // 40)
    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    if portable:
        def mix(col: Column, salt: int) -> Column:
            # md5-derived 60-bit int: reproducible in DuckDB as
            # CAST(('0x' || substring(md5('{salt}:' || x), 1, 15)) AS BIGINT)
            return F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
    else:
        def mix(col: Column, salt: int) -> Column:
            return _mix(col, salt)

    def pick(arr: list, col: Column, salt: int) -> Column:
        a = F.array(*[F.lit(x) for x in arr])
        return F.element_at(a, (mix(col, salt) % len(arr) + 1).cast("int"))

    if portable:
        # Quadratic-skew conversation assignment in EXACT integer math
        # (float pow() may differ by 1 ulp between JVM and other engines,
        # flipping floor() at bucket boundaries): m in [0, 1e9),
        # conv = (m*m) DIV (1e18 div n_convs)  ~  floor((m/1e9)^2 * n_convs)
        m = mix(i, 1) % F.lit(1_000_000_000)
        k_div = 10**18 // n_convs
        df = df.withColumn("_mm", m * m)
        conv_num = F.least(
            F.lit(n_convs - 1).cast("long"), F.expr(f"_mm DIV {k_div}")
        )
    else:
        # Zipf-ish conversation assignment: u^skew concentrates mass near
        # conv 0 (hot conversations) — exercises salting/AQE skew paths.
        u = _uniform(i, 1)
        conv_num = F.floor(F.pow(u, F.lit(skew)) * F.lit(n_convs)).cast("long")
    df = df.withColumn("conv_num", conv_num)
    df = df.withColumn("conv_id", F.format_string("conv-%08d", F.col("conv_num")))

    # Dense, strictly-increasing turn_idx per conversation (ordering
    # invariant, pipeline_design.md:40-52 analog). One shuffle, by design.
    w = Window.partitionBy("conv_num").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))

    d = (mix(i, 2) % 1000).cast("int")  # dialect selector, fixed proportions
    df = df.withColumn("dialect", d)

    # --- payload building blocks, all deterministic functions of id -------
    status = pick(STATUS, i, 3)
    method = pick(METHODS, i, 4)
    path = pick(PATHS, i, 5)
    pod = pick(PODS, i, 6)
    logger = pick(LOGGERS, i, 7)
    level = pick(LEVELS, i, 8)
    tool = pick(TOOLS, i, 9)
    latency = (mix(i, 10) % 500).cast("long")
    nbytes = (mix(i, 11) % 100_000).cast("long")
    epoch_ms = F.lit(1_734_243_648_000) + (i % 86_400_000)
    epoch_s = (epoch_ms / 1000).cast("long")
    ip = F.format_string(
        "10.%d.%d.%d",
        (mix(i, 12) % 250).cast("int"),
        (mix(i, 13) % 250).cast("int"),
        (mix(i, 14) % 250).cast("int"),
    )
    iso_ts = F.date_format(
        F.timestamp_millis(epoch_ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
    )

    thread_name = F.format_string(
        "http-nio-8080-exec-%d", (mix(i, 15) % 20).cast("int")
    )
    http_line = F.format_string(
        '{"Logs":{"timeMillis":%d,"contextMap":{"requestLine":"%s %s HTTP/1.1",'
        '"statusCode":%d,"bytesSent":%d,"processMillis":%d,"remoteHost":"%s"},'
        '"thread":"%s"},"kubernetes":{"pod_name":"%s"}}',
        epoch_ms, method, path, status, nbytes, latency, ip, thread_name, pod,
    )
    apache_line = F.format_string(
        '{"@timestamp":"%s","logs":{"localServerName":"localhost",'
        '"remoteHost":"%s","requestFirstLine":"%s %s HTTP/1.1",'
        '"responseTime":"%d","status":"%d","bytes":"%s","referer":"-",'
        '"userAgent":"kube-probe/1.31","cache status":"TCP_MISS",'
        '"remoteUser":"-","identdUsername":"-",'
        '"time":"[15/Jun/2025:18:14:04 +0000]"},'
        '"kubernetes":{"pod_name":"apache2-igc-9db94ff4f-xzl59","pod_ip":"10.244.1.16"}}',
        iso_ts, ip, method, path, latency, status,
        # dynamic-type coercion exercise: bytes sometimes "-" (-> 0)
        F.when(d % 7 == 0, F.lit("-")).otherwise(nbytes.cast("string")),
    )
    thrown = F.when(
        level == "ERROR",
        F.lit("java.lang.RuntimeException: Payment gateway timeout"),
    ).otherwise(F.lit(None).cast("string"))
    app_line = F.format_string(
        '{"Logs":{"instant":{"epochSecond":%d,"nanoOfSecond":463000000},'
        '"level":"%s","loggerName":"%s","thread":"http-nio-8080-exec-%d",'
        '"message":"%s"%s},"kubernetes":{"pod_name":"%s"}}',
        epoch_s, level, logger, (mix(i, 15) % 20).cast("int"),
        F.when(level == "ERROR", F.lit("Payment processing failed"))
        .otherwise(F.lit("request handled")),
        F.when(thrown.isNotNull(), F.format_string(',"thrown":"%s"', thrown))
        .otherwise(F.lit("")),
        pod,
    )
    container_line = F.format_string(
        '{"@timestamp":"%s","stream":"%s","log":"%s: property name: '
        'ccv2.additional.catalina.opts","time":"%s","kubernetes":{"pod_name":"%s"}}',
        iso_ts,
        F.when(d % 2 == 0, F.lit("stdout")).otherwise(F.lit("stderr")),
        level, iso_ts, pod,
    )
    tool_line = F.format_string(
        "TOOL_CALL tool=%s status=%d latency_ms=%d args_bytes=%d",
        tool, status, latency, nbytes,
    )
    chat_line = pick(CHAT, i, 16)

    # skip-rule / dead-letter payloads (extractor_test.go:681-1161, :283-299)
    skip_empty = F.when(d % 2 == 0, F.lit("")).otherwise(F.lit("   \t  "))
    skip_dash = F.format_string(
        '{"Logs":{"timeMillis":%d,"contextMap":{"requestLine":"-",'
        '"statusCode":400,"bytesSent":0,"processMillis":0,"remoteHost":"%s"}},'
        '"kubernetes":{"pod_name":"%s"}}', epoch_ms, ip, pod,
    )
    skip_rtsp = F.format_string(
        '{"@timestamp":"%s","logs":{"localServerName":"localhost",'
        '"remoteHost":"%s","requestFirstLine":"DESCRIBE /stream RTSP/1.0",'
        '"responseTime":"0","status":"454","bytes":"0","referer":"-",'
        '"userAgent":"-","cache status":"-","remoteUser":"-",'
        '"identdUsername":"-","time":"[15/Jun/2025:18:14:04 +0000]"},'
        '"kubernetes":{"pod_name":"apache2-igc-9db94ff4f-xzl59","pod_ip":"10.244.1.16"}}',
        iso_ts, ip,
    )
    skip_method = F.format_string(
        '{"Logs":{"timeMillis":%d,"contextMap":{"requestLine":'
        '"SSTP_DUPLEX_POST /sra_x HTTP/1.1","statusCode":401,"bytesSent":0,'
        '"processMillis":1,"remoteHost":"%s"}},"kubernetes":{"pod_name":"%s"}}',
        epoch_ms, ip, pod,
    )
    bad_json = F.lit("{invalid json")
    no_ts = F.format_string(
        '{"Logs":{"level":"INFO","loggerName":"%s","message":"no timestamp here"},'
        '"kubernetes":{"pod_name":"%s"}}', logger, pod,
    )

    text = (
        F.when(d < 250, http_line)
        .when(d < 450, apache_line)
        .when(d < 650, app_line)
        .when(d < 800, container_line)
        .when(d < 900, tool_line)
        .when(d < 955, chat_line)
        .when(d < 970, skip_empty)
        .when(d < 980, skip_dash)
        .when(d < 988, skip_rtsp)
        .when(d < 994, skip_method)
        .when(d < 998, bad_json)
        .otherwise(no_ts)
    )

    role = (
        F.when((d >= 800) & (d < 900), F.lit("tool"))
        .when((d >= 900) & (d < 955), pick(["user", "assistant"], i, 17))
        .when(d < 800, pick(["system", "assistant"], i, 18))
        .otherwise(F.lit("user"))
    )
    tool_col = F.when(role == "tool", tool).otherwise(F.lit(None).cast("string"))

    # ts: strictly monotonic within a conversation (base + turn_idx spacing),
    # conversations interleaved/out-of-order relative to each other.
    ts = F.timestamp_seconds(
        F.lit(1_704_067_200)  # 2024-01-01T00:00:00Z
        + (F.col("conv_num") % n_days) * 86_400
        + (mix(F.col("conv_num"), 19) % 43_200)
        + F.col("turn_idx") * 7
    )

    return (
        df.withColumn("role", role)
        .withColumn("text", text)
        .withColumn("tool", tool_col)
        .withColumn("ts", ts)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def role_dim(spark: SparkSession) -> DataFrame:
    from .schemas import ROLE_DIM_ROWS, ROLE_DIM_SCHEMA

    return spark.createDataFrame(ROLE_DIM_ROWS, ROLE_DIM_SCHEMA)


def tool_dim(spark: SparkSession) -> DataFrame:
    from .schemas import TOOL_DIM_ROWS, TOOL_DIM_SCHEMA

    return spark.createDataFrame(TOOL_DIM_ROWS, TOOL_DIM_SCHEMA)
