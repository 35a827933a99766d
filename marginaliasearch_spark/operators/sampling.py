"""Deterministic corpus sampling and mixture composition.

Training-data pipelines need REPRODUCIBLE sampling — the same corpus,
salt and rates must yield the same subset on any cluster, any partition
layout, any run (Spark's ``DataFrame.sample`` is none of those things:
it is partition-order dependent).  Everything here keys off a
multiplicative integer hash of a stable row id, as a pure Column
expression (whole-stage codegen, zero Python):

- ``hash_sample``: keep a row iff h(id, salt) < fraction·2^32 — an
  order-independent Bernoulli sample;
- ``stratified_sample``: per-stratum fractions (e.g. by language or
  quality bucket) via a broadcast rates dimension;
- ``balanced_sample``: at most N rows per stratum, chosen by hash rank —
  the "cap every language at N documents" mixture op;
- ``dedup_keep_best``: one keeper per near-dup group by (quality, id)
  argmax — the composition step after connected-components grouping.

At 100 TB none of these shuffle the corpus except ``balanced_sample``
(one shuffle on the stratum key for the rank window) — the Bernoulli and
stratified forms are pure map-side filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 · frac(phi)); the hash is
# h(x) = (x · K + salt · GOLDEN) mod 2^32 — the LOW 32 bits carry the
# fractional part of x·phi (a Weyl sequence, equidistributed on
# [0, 2^32) for sequential ids).  Deliberately SQL-expressible so the
# driver's DuckDB oracle recomputes the EXACT same subset.
_K = 2654435761
_GOLDEN = 0x9E3779B9
_TWO32 = 1 << 32


def _hash32(id_col: Column, salt: int) -> Column:
    """Order-independent 32-bit hash of a BIGINT id as a pure Column.

    (id·K) mod 2^32 depends only on the low 32 bits of id, so the
    multiply is split into 16-bit halves to stay inside a signed long
    under ANSI mode (Spark 4 throws on long overflow): with
    lo = a + b·2^16,  lo·K ≡ a·K + ((b·K) mod 2^16)·2^16  (mod 2^32),
    every intermediate < 2^49."""
    lo = id_col.cast("long").bitwiseAND(F.lit(_TWO32 - 1))
    a = lo.bitwiseAND(F.lit(0xFFFF))
    b = F.shiftrightunsigned(lo, 16)
    h = (
        a * F.lit(_K)
        + (b * F.lit(_K)).bitwiseAND(F.lit(0xFFFF)) * F.lit(1 << 16)
        + F.lit((salt * _GOLDEN) % _TWO32)
    )
    return h.bitwiseAND(F.lit(_TWO32 - 1))


def hash32_sql(id_expr: str, salt: int = 42) -> str:
    """The DuckDB mirror of ``_hash32``: HUGEINT arithmetic needs no
    split, only the two's-complement low-32 reduction of negative ids."""
    lo = f"((({id_expr}::HUGEINT % 4294967296) + 4294967296) % 4294967296)"
    return (
        f"CAST((({lo} * {_K} + {(salt * _GOLDEN) % _TWO32})"
        f" % 4294967296::HUGEINT) AS BIGINT)"
    )


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff hash32(id) < fraction·2^32.
    Same rows on every run, cluster and partitioning."""
    return df.filter(_hash32(F.col(id_col), salt) < int(fraction * _TWO32))


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` is a small
    (stratum, fraction) dimension, broadcast onto the corpus; rows keep
    iff hash32(id) < fraction·2^32.  Strata absent from ``rates`` use
    ``default_fraction``.  Pure map-side filter — no corpus shuffle."""
    r = rates.select(
        F.col(stratum_col),
        (F.col("fraction") * _TWO32).cast("long").alias("_thr"),
    )
    joined = df.join(F.broadcast(r), stratum_col, "left")
    thr = F.coalesce(F.col("_thr"), F.lit(int(default_fraction * _TWO32)))
    return joined.filter(_hash32(F.col(id_col), salt) < thr).drop("_thr")


def balanced_sample(
    df: DataFrame,
    max_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Cap every stratum at ``max_per_stratum`` rows, chosen by hash rank
    (deterministic, unbiased within the stratum).  One shuffle on the
    stratum key; ties broken by id so the result is total-order stable."""
    w = Window.partitionBy(stratum_col).orderBy(
        _hash32(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_stratum)
        .drop("_rk")
    )


def dedup_keep_best(
    df: DataFrame,
    groups: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """One keeper per near-dup group: highest quality wins, lowest id
    breaks ties; rows outside any group keep themselves.  ``groups`` is
    (id, component) from connected-components over near-dup pairs
    (operators/graph.py).  One shuffle on the component key.

    Measured note (round 6): a "decide keepers on the narrow projection,
    semi-join back" rewrite (anti-join passthrough + min_by aggregation
    + keeper semi-join) was implemented and REVERTED — Spark 4 compiles
    the rank-1 filter to WindowGroupLimit, which prunes to ~1 row/key on
    the map side before the exchange, so the window form already has the
    partial-aggregation shape; the rewrite's extra joins/aggregates were
    strictly slower (sf1 pathological corpus: 0.86–1.5 s window vs
    1.3–1.9 s rewrite, identical 46,266-row output)."""
    g = groups.select(
        F.col("id").alias(id_col), F.col("component").alias("_comp")
    )
    joined = df.join(g, id_col, "left").withColumn(
        "_comp", F.coalesce(F.col("_comp"), F.col(id_col))
    )
    w = Window.partitionBy("_comp").orderBy(
        F.desc(quality_col), F.col(id_col)
    )
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_comp")
    )
