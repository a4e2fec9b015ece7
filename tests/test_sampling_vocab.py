"""Deterministic sampling (splits / strata / mixture) and vocabulary
(df / TF-IDF) operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from commerce_logs_pipeline_spark.operators import sampling, vocab


def _ids(spark, n=5000, domains=("web", "code", "wiki")):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(d) for d in domains]),
            (F.col("id") % len(domains) + 1).cast("int"),
        ).alias("source"),
    )


# --- split_assign -----------------------------------------------------------
@pytest.mark.parametrize("portable", [False, True])
def test_split_assign_total_and_proportions(spark, portable):
    df = _ids(spark)
    out = sampling.split_assign(df, portable=portable)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000  # every row assigned exactly once
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_split_assign_is_pure_function_of_id(spark):
    """Membership must not depend on row order / partitioning (the rand()
    failure mode this operator exists to avoid)."""
    df = _ids(spark)
    a = {r.doc_id: r.split for r in sampling.split_assign(df).collect()}
    b = {
        r.doc_id: r.split
        for r in sampling.split_assign(
            df.orderBy(F.desc("doc_id")).repartition(7)
        ).collect()
    }
    assert a == b


def test_split_assign_validates_fractions(spark):
    with pytest.raises(ValueError):
        sampling.split_assign(_ids(spark, 10), fractions={"a": 0.5, "b": 0.4})


def test_split_assign_is_map_only(spark):
    plan = (
        sampling.split_assign(_ids(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # scan-local gate: no shuffle at any SF


# --- stratified_sample ------------------------------------------------------
@pytest.mark.parametrize("portable", [False, True])
def test_stratified_sample_rates_and_subset(spark, portable):
    df = _ids(spark, 6000)
    out = sampling.stratified_sample(
        df, "source", {"web": 0.5, "code": 0.1}, portable=portable
    )
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "wiki" not in counts  # default_fraction=0 drops unlisted strata
    assert abs(counts["web"] / 2000 - 0.5) < 0.05
    assert abs(counts["code"] / 2000 - 0.1) < 0.03
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    again = {
        r.doc_id
        for r in sampling.stratified_sample(
            df.repartition(5), "source", {"web": 0.5, "code": 0.1},
            portable=portable,
        ).select("doc_id").collect()
    }
    assert kept == again  # retry/replay-stable membership


# --- mixture ----------------------------------------------------------------
def test_mix_thresholds_exact_integer_plan():
    space = sampling.HASH_SPACE
    n_star, thr = sampling.mix_thresholds(
        {"a": 100, "b": 50}, {"a": 1, "b": 1}, space
    )
    # W=2; N* = min(100*2//1, 50*2//1) = 100; a keeps 1*100/(2*100) = 1/2,
    # b keeps 1*100/(2*50) = all
    assert n_star == 100
    assert thr["a"] == space // 2
    assert thr["b"] == space

    with pytest.raises(ValueError):
        sampling.mix_thresholds({"a": 1, "zzz": 1}, {"a": 1})


@pytest.mark.parametrize("portable", [False, True])
def test_resample_to_mix_hits_target_proportions(spark, portable):
    df = _ids(spark, 9000)  # 3000 per domain
    out = sampling.resample_to_mix(
        df, "source", {"web": 6, "code": 3, "wiki": 1}, portable=portable
    )
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # web is the binding domain (w=6): N* = 3000*10//6 = 5000 ->
    # targets web 3000 (all), code 1500, wiki 500
    assert counts["web"] == 3000
    assert abs(counts["code"] - 1500) < 120
    assert abs(counts["wiki"] - 500) < 80


# --- vocab ------------------------------------------------------------------
def test_doc_frequency_counts_docs_not_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")],
        "doc_id long, text string",
    )
    df = {r.term: r.df_count for r in vocab.doc_frequency(docs).collect()}
    assert df == {"a": 2, "b": 1, "c": 2}


def test_tfidf_topk_scores_and_ranking(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")],
        "doc_id long, text string",
    )
    rows = vocab.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    idf = lambda dfc: math.log(4 / (dfc + 1)) + 1  # N=3 -> (N+1)=4
    # doc 1: a tf=2 df=2 -> 2*(ln(4/3)+1); b tf=1 df=1 -> ln(2)+1
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in top1] == ["a", "b"]
    assert top1[0].tfidf == pytest.approx(round(2 * idf(2), 6), abs=1e-9)
    assert top1[1].tfidf == pytest.approx(round(1 * idf(1), 6), abs=1e-9)
    # doc 2: tie tf=1 on a (df=2) and c (df=2) -> equal tfidf, term-asc
    top2 = sorted(by_doc[2], key=lambda r: r.rank)
    assert [r.term for r in top2] == ["a", "c"]
    assert top2[0].tfidf == top2[1].tfidf
    # doc 3: single term, k=2 returns just 1 row
    assert [r.term for r in by_doc[3]] == ["c"]
    assert by_doc[3][0].tf == 3


# --- pack_greedy ------------------------------------------------------------
from commerce_logs_pipeline_spark.operators import packing  # noqa: E402


def _docs_with_tokens(spark, n=2000):
    # deterministic token counts 5..104, plus a handful of oversize docs
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 97 == 0, F.lit(400))
        .otherwise((F.col("id") * 37 % 100 + 5))
        .cast("long")
        .alias("n_tokens"),
    )


@pytest.mark.parametrize("portable", [False, True])
def test_pack_greedy_respects_capacity_and_covers_all(spark, portable):
    df = _docs_with_tokens(spark)
    out = packing.pack_greedy(
        df, tokens_col="n_tokens", capacity=256, n_shards=8,
        seed=3, portable=portable,
    )
    rows = out.collect()
    assert len(rows) == 2000  # every doc packed exactly once
    assert len({r.doc_id for r in rows}) == 2000
    fills = {}
    for r in rows:
        fills.setdefault(r.pack_id, []).append(r)
    for pack_rows in fills.values():
        pack_rows.sort(key=lambda r: r.pack_pos)
        assert [r.pack_pos for r in pack_rows] == list(range(len(pack_rows)))
        total = sum(r.n_tokens for r in pack_rows)
        assert pack_rows[-1].pack_fill == total
        # capacity respected unless the pack is a single oversize doc
        assert total <= 256 or len(pack_rows) == 1


def test_pack_greedy_oversize_doc_is_alone(spark):
    df = _docs_with_tokens(spark)
    out = packing.pack_greedy(
        df, tokens_col="n_tokens", capacity=256, n_shards=8, seed=3
    )
    oversize = out.filter(F.col("n_tokens") > 256)
    assert oversize.count() > 0
    joined = (
        out.groupBy("pack_id").agg(F.count("*").alias("n"))
        .join(oversize, "pack_id")
    )
    assert joined.filter(F.col("n") > 1).count() == 0


def test_pack_greedy_rejects_null_and_negative_counts(spark):
    """ADVICE r5: a null/negative token count (e.g. size(null) = -1
    upstream) must fail loudly instead of silently corrupting pack_fill
    and capacity accounting."""
    bad_null = spark.createDataFrame(
        [(0, 10), (1, None), (2, 7)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="null or negative token count"):
        packing.pack_greedy(bad_null, "n_tokens", capacity=64).collect()
    bad_neg = spark.createDataFrame(
        [(0, 10), (1, -1)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="null or negative token count"):
        packing.pack_greedy(bad_neg, "n_tokens", capacity=64).collect()


def test_pack_greedy_deterministic_under_repartition(spark):
    """Assignments are a pure function of (id, tokens, seed) — immune to
    input order/partitioning, hence to task retries and speculation."""
    df = _docs_with_tokens(spark)
    a = packing.pack_greedy(df, "n_tokens", capacity=200, seed=9).collect()
    b = packing.pack_greedy(
        df.repartition(13).sortWithinPartitions(F.desc("doc_id")),
        "n_tokens", capacity=200, seed=9,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_stats_utilization(spark):
    df = _docs_with_tokens(spark)
    out = packing.pack_greedy(
        df, "n_tokens", capacity=256, n_shards=8, seed=3
    )
    stats = packing.pack_stats(out, capacity=256).collect()
    assert sum(r.n_docs for r in stats) == 2000
    for r in stats:
        assert 0 < r.utilization <= 1.0 or r.n_packs == 0
        # greedy on 5..104-token docs should fill packs reasonably well
    overall = sum(r.avg_fill * r.n_packs for r in stats) / sum(
        r.n_packs for r in stats
    )
    assert overall > 0.7 * 256


def test_assemble_packs_concatenates_in_order(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i} " * ((i * 37) % 20 + 1)) for i in range(300)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    packed = packing.pack_greedy(
        docs, "n_tokens", capacity=64, n_shards=4, seed=11
    )
    out = packing.assemble_packs(docs, packed, sep="|")
    rows = {r.pack_id: r for r in out.collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    asg = [(r.pack_id, r.pack_pos, r.doc_id, r.pack_fill)
           for r in packed.collect()]
    # every pack reconstructs exactly from its members in pack_pos order
    by_pack = {}
    for pid, pos, did, fill in sorted(asg):
        by_pack.setdefault(pid, []).append((pos, did, fill))
    assert set(by_pack) == set(rows)
    for pid, members in by_pack.items():
        expected_text = "|".join(texts[d] for _, d, _ in members)
        assert rows[pid].text == expected_text
        assert rows[pid].n_docs == len(members)
        assert rows[pid].n_tokens == members[-1][2]  # final pack_fill


# --- build_vocab / encode_docs ---------------------------------------------
def _corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cat and dog and cat"),
        (3, "completely novel unseen words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_vocab_deterministic_ranking(spark):
    v = {r.term: (r.token_id, r.n_occurrences)
         for r in vocab.build_vocab(_corpus(spark), size=5).collect()}
    assert len(v) == 5
    # "the" (4x) must be id 1 (reserved=1 leaves 0 for <unk>)
    assert v["the"][0] == 1 and v["the"][1] == 4
    # ties broken by term asc: and/cat/on/sat all appear; ids contiguous
    assert sorted(tid for tid, _ in v.values()) == [1, 2, 3, 4, 5]


def test_encode_docs_roundtrip_and_unk(spark):
    docs = _corpus(spark)
    v = vocab.build_vocab(docs, size=8)
    enc = {r.doc_id: r for r in vocab.encode_docs(docs, v).collect()}
    terms = {r.token_id: r.term for r in v.collect()}
    # every doc encodes to exactly its token count, order preserved
    assert enc[0].n_tokens == 6
    decoded = [terms.get(t, "<unk>") for t in enc[0].token_ids]
    assert decoded[0] == "the" and decoded[4] == "the"
    assert "the cat sat on the mat".split()[1] == decoded[1] == "cat"
    # doc 3 is entirely OOV at size=8? its rare terms may or may not fit;
    # force a tiny vocab to guarantee unks
    tiny = vocab.build_vocab(docs, size=2)
    enc3 = {r.doc_id: r for r in vocab.encode_docs(docs, tiny).collect()}
    assert 0 in enc3[3].token_ids  # unk_id present for OOV terms
    assert all(t in (0, 1, 2) for r in enc3.values() for t in r.token_ids)


def test_encode_docs_keeps_zero_token_docs(spark):
    """ADVICE r5: a doc whose text tokenizes to zero tokens (empty,
    whitespace, or null) must stay on the output spine as
    (doc_id, 0, []) — not silently vanish — so downstream invariants
    like encoded_docs == survivor_docs hold."""
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    v = vocab.build_vocab(docs, size=4)
    enc = {r.doc_id: r for r in vocab.encode_docs(docs, v).collect()}
    assert set(enc) == {0, 1, 2, 3}
    assert enc[0].n_tokens == 2 and len(enc[0].token_ids) == 2
    for d in (1, 2, 3):
        assert enc[d].n_tokens == 0
        assert list(enc[d].token_ids) == []


def test_assemble_packs_matches_duckdb_string_agg(spark):
    """Engine-independent assembly parity: DuckDB's
    string_agg(text ORDER BY pack_pos) over the SAME pack assignments
    must reproduce every assembled sequence byte-for-byte."""
    import duckdb

    docs = spark.createDataFrame(
        [(i, f"w{i} " * (i % 9 + 1)) for i in range(400)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    packed = packing.pack_greedy(
        docs, "n_tokens", capacity=40, n_shards=4, seed=21
    )
    got = {
        (r.shard, r.pack_id): (r.text, r.n_docs)
        for r in packing.assemble_packs(docs, packed, sep="|").collect()
    }

    con = duckdb.connect()
    con.register("docs", docs.select("doc_id", "text").toPandas())
    con.register("asg", packed.toPandas())
    oracle = con.execute("""
        SELECT a.shard, a.pack_id,
               string_agg(d.text, '|' ORDER BY a.pack_pos) AS text,
               count(*) AS n_docs
        FROM asg a JOIN docs d USING (doc_id)
        GROUP BY a.shard, a.pack_id
    """).fetchall()
    exp = {(r[0], r[1]): (r[2], r[3]) for r in oracle}
    assert got == exp


def test_encode_docs_matches_duckdb(spark):
    """Engine-independent encoding parity: DuckDB re-derives the token-id
    sequences from the SAME vocabulary with unnest + ordered list agg —
    order preservation and OOV->unk must match exactly."""
    import duckdb

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 13} gamma w{(i * 7) % 13}") for i in range(300)],
        "doc_id long, text string",
    )
    v = vocab.build_vocab(docs, size=9)
    got = {r.doc_id: (r.n_tokens, r.token_ids)
           for r in vocab.encode_docs(docs, v).collect()}

    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    con.register("vocab", v.toPandas())
    oracle = con.execute("""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
                                                     '\\s+')) AS term,
                   generate_subscripts(string_split_regex(trim(lower(text)),
                                                          '\\s+'), 1) AS pos
            FROM docs
        )
        SELECT t.doc_id, count(*) AS n_tokens,
               list(coalesce(v.token_id, 0) ORDER BY t.pos) AS ids
        FROM toks t LEFT JOIN vocab v USING (term)
        GROUP BY t.doc_id
    """).fetchall()
    exp = {r[0]: (r[1], r[2]) for r in oracle}
    assert got == exp
