"""Deterministic sampling / mixture ops (operators/sampling.py): the
subset must be identical under any partitioning — the property
DataFrame.sample lacks."""

from pyspark.sql import functions as F

from marginaliasearch_spark.operators.sampling import (
    balanced_sample,
    dedup_keep_best,
    hash_sample,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")


def test_hash_sample_partition_independent(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(17, "lang"), 0.3).collect()
    }
    c = {r["doc_id"] for r in hash_sample(docs.coalesce(1), 0.3).collect()}
    assert a == b == c
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # roughly the asked fraction


def test_stratified_rates_respected(spark):
    docs = _docs(spark)
    rates = spark.createDataFrame(
        [("en", 1.0), ("de", 0.0)], "lang string, fraction double"
    )
    out = stratified_sample(docs, rates)
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "de" not in got  # zero-rate stratum fully dropped
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.filter(F.col("lang") == "en").count() == n_en  # rate 1.0 keeps all
    # absent strata use default_fraction (0.0)
    assert "fr" not in got


def test_balanced_cap_and_determinism(spark):
    docs = _docs(spark)
    out = balanced_sample(docs, 5)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 5 for v in per.values())
    again = balanced_sample(docs.repartition(13), 5)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_dedup_keep_best_argmax(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5)], "doc_id long, quality long"
    )
    groups = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100)], "id long, component long"
    )
    kept = sorted(r["doc_id"] for r in dedup_keep_best(docs, groups).collect())
    # group 100: quality 30 tie between 2,3 → lowest id (2); 4 ungrouped keeps itself
    assert kept == [2, 4]


def test_dedup_keep_best_matches_bruteforce(spark):
    """The aggregation form (keeper decided on the narrow projection, no
    corpus shuffle) equals a python brute force over randomized groups —
    quality ties, singleton groups, negative qualities, ungrouped rows."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 500
    quality = rng.integers(-5, 6, size=n)
    rows = [(int(i), int(quality[i])) for i in range(n)]
    comp_of = {i: int(rng.integers(0, 60)) for i in range(300)}  # 300 grouped
    grows = [(i, 10_000 + c) for i, c in comp_of.items()]
    docs = spark.createDataFrame(rows, "doc_id long, quality long")
    groups = spark.createDataFrame(grows, "id long, component long")

    best: dict = {}
    for i, c in comp_of.items():
        cand = (-quality[i], i)
        if c not in best or cand < best[c]:
            best[c] = cand
    want = sorted({i for i in range(300, n)} | {i for _, i in best.values()})
    got = sorted(r["doc_id"] for r in dedup_keep_best(docs, groups).collect())
    assert got == want


def test_hash32_sql_mirror_bit_exact(spark):
    """The DuckDB mirror equals the Spark Column form over random 64-bit
    ids including negatives (the ANSI-safe split multiply vs HUGEINT mod
    arithmetic)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from marginaliasearch_spark.operators.sampling import _hash32, hash32_sql

    rng = np.random.default_rng(11)
    ids = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64),
            np.arange(-5, 50),
            np.array([0, 2**63 - 1, -(2**63), 2**32, -(2**32)], dtype=np.int64),
        ]
    )
    pdf = pd.DataFrame({"doc_id": ids})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["h"]
        for r in sdf.select("doc_id", _hash32(F.col("doc_id"), 42).alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = dict(con.execute(f"SELECT doc_id, {hash32_sql('doc_id')} FROM t").fetchall())
    assert got == {k: int(v) for k, v in want.items()}
