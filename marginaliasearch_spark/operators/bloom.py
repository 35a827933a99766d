"""Partitioned Bloom-filter dedup — the scale path for the URL-seen set.

North-rule requirement: "URL-seen dedup uses a partitioned Bloom/cuckoo
filter keyed by canonicalized-URL hash".  Spark's internal
``bloom_filter_agg`` expression is not exposed in the public function
registry (4.1), so this is a numpy split-bloom:

- one Bloom filter per frontier *bucket* (the xxhash64(domain)%N partition
  key), built with ``applyInPandas`` — a single pass over the seen-set,
  fully vectorized bit-setting;
- the candidate side probes the broadcast filters with a pandas UDF
  (vectorized double-hashing, k probes per key);
- Bloom negatives are *definitely new* and skip the join entirely; only
  the maybe-positives go through the exact anti-join (Bloom gives no
  false negatives, so the result equals the exact anti-join — tested).

At 10^10 keys / 10 bits per key the per-bucket filters total ~12 GB split
across buckets — each executor holds only its buckets' filters, which is
the point of partitioning them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K = 7  # probes per key
_BITS_PER_KEY = 12


def _positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """k probe positions per key via double hashing (vectorized).
    keys: uint64 [n] → positions uint64 [n, k]."""
    with np.errstate(over="ignore"):
        h = keys.copy()
        h ^= h >> np.uint64(33)
        h1 = h * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (h ^ (h1 >> np.uint64(29))) * np.uint64(0xC4CEB9FE1A85EC53) | np.uint64(1)
        i = np.arange(_K, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


def _build_filter(keys: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(keys.astype(np.uint64), m_bits).reshape(-1)
        np.bitwise_or.at(bits, pos >> np.uint64(3), np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits.tobytes()


def _might_contain(bloom: np.ndarray, keys: np.ndarray, m_bits: int) -> np.ndarray:
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(keys.astype(np.uint64), m_bits)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return ((bloom[byte_idx] & bit) != 0).all(axis=1)


BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("m_bits", T.LongType()),
        T.StructField("bloom", T.BinaryType()),
    ]
)


def build_bloom_per_bucket(
    seen: DataFrame, key_col: str = "url_hash", bucket_col: str = "bucket"
) -> DataFrame:
    """One Bloom filter per bucket over the seen-set keys."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
        keys = np.unique(keys)
        m_bits = max(64, int(len(keys) * _BITS_PER_KEY))
        return pd.DataFrame(
            {
                "bucket": [int(pdf[bucket_col].iloc[0])],
                "n_keys": [len(keys)],
                "m_bits": [m_bits],
                "bloom": [_build_filter(keys, m_bits)],
            }
        )

    return seen.select(bucket_col, key_col).groupBy(bucket_col).applyInPandas(
        build, BLOOM_SCHEMA
    )


def bloom_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    key_col: str = "url_hash",
    bucket_col: str = "bucket",
) -> DataFrame:
    """candidates ∖ seen on key_col, Bloom-prefiltered per bucket.

    Equal to ``candidates.join(seen, key, "left_anti")`` (no false
    negatives); the exact join only sees Bloom maybe-positives.
    """
    spark = candidates.sparkSession
    blooms = {
        r["bucket"]: (np.frombuffer(r["bloom"], dtype=np.uint8), int(r["m_bits"]))
        for r in build_bloom_per_bucket(seen, key_col, bucket_col).collect()
    }
    bc = spark.sparkContext.broadcast(blooms)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(bucket: pd.Series, keys: pd.Series) -> pd.Series:
        filters = bc.value
        out = np.zeros(len(keys), dtype=bool)
        kb = keys.to_numpy(dtype=np.int64).view(np.uint64)
        bvals = bucket.to_numpy()
        for b in np.unique(bvals):
            f = filters.get(int(b))
            if f is None:
                continue
            mask = bvals == b
            out[mask] = _might_contain(f[0], kb[mask], f[1])
        return pd.Series(out)

    flagged = candidates.withColumn(
        "_maybe_seen", maybe_seen(F.col(bucket_col), F.col(key_col))
    )
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    checked = needs_check.join(
        seen.select(key_col).distinct(), key_col, "left_anti"
    )
    return definitely_new.unionByName(checked)
