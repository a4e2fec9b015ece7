"""Physical-plan shape assertions — the scale contract, pinned by tests:
filters reach the parquet scan, dims broadcast, the parse stage stays
map-only (no shuffle), and scans prune to the referenced columns."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    import __spark_entry__ as E

    plan = _plan(E.queries()["filter_pushdown_revenue"](spark, SF))
    assert "PushedFilters" in plan
    # range + quantity predicates pushed into the parquet reader
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_scan_prunes_columns(spark):
    import __spark_entry__ as E

    plan = _plan(E.queries()["filter_pushdown_revenue"](spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # a 2-measure aggregate over a 16-column table reads only what it needs
    assert "l_extendedprice" in read_schema and "l_discount" in read_schema
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_dim_joins_broadcast(spark):
    import __spark_entry__ as E

    plan = _plan(E.queries()["broadcast_dim_join"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_parse_stage_is_map_only(spark, transcripts_10k, tmp_path):
    """The parse kernel must introduce ZERO shuffles: at 100 TB it's an
    embarrassingly parallel map over the scan (the synth generator's own
    window shuffle is excluded by round-tripping through parquet)."""
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts

    path = str(tmp_path / "t")
    transcripts_10k.write.mode("overwrite").parquet(path)
    plan = _plan(parse_transcripts(spark.read.parquet(path)))
    assert "Exchange" not in plan


def test_enrich_stays_broadcast_and_map_only(spark, transcripts_10k, tmp_path):
    from commerce_logs_pipeline_spark.functions.parse import parse_transcripts
    from commerce_logs_pipeline_spark.plans.enrich import (
        enrich_with_default_dims,
    )

    path = str(tmp_path / "t")
    transcripts_10k.write.mode("overwrite").parquet(path)
    plan = _plan(
        enrich_with_default_dims(parse_transcripts(spark.read.parquet(path)))
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchanges are the tiny dims' broadcast exchanges
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "BroadcastExchange" in line, line


def test_selector_filter_is_sargable(spark):
    """F3 date-prefix narrowing pushes to the scan as a StartsWith."""
    from commerce_logs_pipeline_spark.functions.selectors import (
        filter_blobs_for_date,
    )

    df = spark.createDataFrame(
        [("kubernetes/20250613.a_b_c-d.gz",)], "blob_name string"
    )
    path = str(spark.conf.get("spark.sql.warehouse.dir")).replace("file:", "")
    out = path + "/blobs_plan_test"
    df.write.mode("overwrite").parquet(out)
    plan = _plan(
        filter_blobs_for_date(
            spark.read.parquet(out), "apache-proxy", "20250613"
        )
    )
    assert "PushedFilters" in plan
    assert "StartsWith" in plan.split("PushedFilters")[1][:300]


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Co-located join contract: two tables bucketed identically on the
    join key must sort-merge-join with ZERO shuffle exchanges — the
    pay-once partitioning that replaces the reference's co-partitioned
    topics. At 100 TB this is the difference between a join that moves
    both tables and one that moves nothing."""
    from pyspark.sql import functions as F

    from commerce_logs_pipeline_spark.sources.tables import (
        bucketed_join,
        write_bucketed,
    )

    # (warehouse.dir is a static conf — tables land in the session default
    # warehouse and are dropped in the finally)
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("vb")
    )
    write_bucketed(a, "bk_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bk_b", ["k"], n_buckets=8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner must pick SMJ, exposing whether
        # bucketing removed the exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bk_a", "bk_b", on=["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_ivf_and_lsh_probe_joins_broadcast_no_cartesian(spark):
    """The ANN scale paths must never plan a cartesian product: the cell/
    bucket candidate joins broadcast the (tiny, exploded) query side."""
    import math

    from commerce_logs_pipeline_spark.operators import ann

    rows = [
        (i, [math.cos(i * 0.19), math.sin(i * 0.19), 0.1 * i % 1.0, 0.05])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 4")
    for frame in (
        ann.lsh_topk(df, q, k=3, n_planes=4, dim=4, probes=2),
        ann.ivf_topk(df, q, k=3, n_cells=4, nprobe=2),
        ann.ivf_topk(df, q, k=3, n_cells=4, nprobe=2, use_numpy=True),
    ):
        plan = _plan(frame)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


def test_dup_clusters_rounds_are_join_aggregate_only(spark):
    """Each CC round must be an equi-join + hash aggregate over the
    checkpointed label frame — no cartesian, no nested-loop, and the
    returned frame's plan is lineage-cut (no per-round plan growth)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    from commerce_logs_pipeline_spark.operators import dedup

    with dedup.released_after():
        out = dedup.dup_clusters(pairs)
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # lineage-cut: the final plan reads the checkpointed RDD, not a
        # 2^rounds-deep join tree
        assert plan.count("Scan ExistingRDD") >= 1
        assert len(plan.splitlines()) < 40


def test_pack_greedy_single_shuffle_arrow_scan(spark):
    """pack_greedy's physical plan: exactly ONE exchange (the shard hash
    partition) feeding a streaming MapInPandas over in-partition-sorted
    rows — no hidden extra shuffle, no row-at-a-time Python, and no
    whole-group materialization (FlatMapGroupsInPandas would load a full
    shard per task — the r6 bounded-memory rework removed it)."""
    from commerce_logs_pipeline_spark.operators import packing

    docs = spark.range(500).selectExpr(
        "id AS doc_id", "cast(id % 90 + 5 as long) AS n_tokens"
    )
    p = packing.pack_greedy(docs, "n_tokens", capacity=64, n_shards=4)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan  # no whole-shard frames
    assert "BatchEvalPython" not in plan  # never the row-at-a-time path


def test_encode_docs_vocab_join_is_broadcast(spark):
    """encode_docs joins the vocabulary by broadcast — the per-token
    exploded frame must never sort-merge against a 32k-row dim table."""
    from commerce_logs_pipeline_spark.operators import vocab

    docs = spark.range(300).selectExpr(
        "id AS doc_id",
        "concat('alpha beta gamma item', id % 9) AS text",
    )
    v = vocab.build_vocab(docs, size=10)
    e = vocab.encode_docs(docs, v)
    plan = e._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
