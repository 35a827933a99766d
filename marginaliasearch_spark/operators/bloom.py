"""Partitioned Bloom-filter dedup — the scale path for the URL-seen set.

North-rule requirement: "URL-seen dedup uses a partitioned Bloom/cuckoo
filter keyed by canonicalized-URL hash".  Spark's internal
``bloom_filter_agg`` expression is not exposed in the public function
registry (4.1), so this is a numpy split-bloom:

- one Bloom filter per frontier *bucket* (the xxhash64(domain)%N partition
  key), built with ``applyInPandas`` — a single pass over the seen-set,
  fully vectorized bit-setting;
- the candidate side probes via a COGROUP on the bucket key: each task
  receives exactly one bucket's candidates and that bucket's filter —
  filter bytes move executor→executor through the shuffle, never through
  the driver, and no executor ever holds more than its own buckets'
  filters (at 10^10 keys / 12 bits that is ~15 GB total split across
  buckets; any single bucket's filter is 15 GB / n_buckets);
- Bloom negatives are *definitely new* and skip the seen-set entirely;
  only the maybe-positives (true dupes + ~p false positives) go through
  the exact check.  Because that set is SMALL, the check is a scan-only
  pattern: broadcast the maybe-positive keys, left-semi the seen-set
  against them (seen is scanned once, never shuffled), then anti-join the
  maybe-positives against the surviving true-dupe keys (also broadcast).
  Bloom gives no false negatives, so the result equals the exact
  anti-join — tested for ≡.  The exact join, by contrast, must SHUFFLE
  the full seen-set on the key every wave — at 10^10 keys that is the
  difference between a 250 GB shuffle and a scan;
- filters are INCREMENTAL: with a fixed per-bucket ``m_bits`` the union
  of two filters is their bitwise OR, so each snapshot only hashes the
  NEW keys and ORs them in (``bloom_or_new_keys``) — the 10^10-key
  seen-set is never rescanned.

On a real cluster the seen-set and candidate tables are bucket-partitioned
Iceberg tables, so the cogroups become storage-partitioned joins with no
shuffle of the big side.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K = 7  # probes per key
_BITS_PER_KEY = 12

# persisted intermediates awaiting release (bloom_anti_join persists its
# probe output because two consumers read it; long-lived callers release
# them after materializing the result)
_TRANSIENT: list = []


def unpersist_transients() -> None:
    """Release persisted probe intermediates from prior bloom_anti_join
    calls.  Call after the join's result is materialized (written or
    collected) — FrontierDedup.ingest does this every snapshot so a
    long-running admission loop doesn't accumulate cached blocks."""
    while _TRANSIENT:
        df = _TRANSIENT.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass


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


def _set_bits(bits: np.ndarray, keys: np.ndarray, m_bits: int) -> None:
    pos = _positions(keys.astype(np.uint64), m_bits).reshape(-1)
    np.bitwise_or.at(
        bits, pos >> np.uint64(3), np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )


def _build_filter(keys: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(keys):
        _set_bits(bits, keys, m_bits)
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
    seen: DataFrame,
    key_col: str = "url_hash",
    bucket_col: str = "bucket",
    m_bits: Optional[int] = None,
) -> DataFrame:
    """One Bloom filter per bucket over the seen-set keys.

    ``m_bits`` fixes every bucket's filter size (required for incremental
    OR-union across snapshots); None sizes each filter to its key count.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
        keys = np.unique(keys)
        m = m_bits if m_bits else max(64, int(len(keys) * _BITS_PER_KEY))
        return pd.DataFrame(
            {
                "bucket": [int(pdf[bucket_col].iloc[0])],
                "n_keys": [len(keys)],
                "m_bits": [m],
                "bloom": [_build_filter(keys, m)],
            }
        )

    return seen.select(bucket_col, key_col).groupBy(bucket_col).applyInPandas(
        build, BLOOM_SCHEMA
    )


def bloom_or_new_keys(
    blooms: DataFrame,
    new_seen: DataFrame,
    key_col: str = "url_hash",
    bucket_col: str = "bucket",
    default_m_bits: int = 1 << 23,
) -> DataFrame:
    """Incremental snapshot update: OR the NEW keys' bits into each bucket's
    existing filter (same m_bits ⇒ union of filters = bitwise OR).  Buckets
    with no prior filter get a fresh one at ``default_m_bits``.  Only the
    new keys are hashed — the historical seen-set is never rescanned."""

    def merge(old_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        if old_pdf.empty and new_pdf.empty:
            return pd.DataFrame(columns=["bucket", "n_keys", "m_bits", "bloom"])
        if new_pdf.empty:
            return old_pdf[["bucket", "n_keys", "m_bits", "bloom"]]
        keys = np.unique(new_pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64))
        if old_pdf.empty:
            bucket = int(new_pdf[bucket_col].iloc[0])
            m = default_m_bits
            bits = np.zeros((m + 7) // 8, dtype=np.uint8)
            n_old = 0
        else:
            bucket = int(old_pdf["bucket"].iloc[0])
            m = int(old_pdf["m_bits"].iloc[0])
            bits = np.frombuffer(old_pdf["bloom"].iloc[0], dtype=np.uint8).copy()
            n_old = int(old_pdf["n_keys"].iloc[0])
        _set_bits(bits, keys, m)
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "n_keys": [n_old + len(keys)],  # upper bound (dupes not probed)
                "m_bits": [m],
                "bloom": [bits.tobytes()],
            }
        )

    return (
        blooms.groupBy("bucket")
        .cogroup(new_seen.select(bucket_col, key_col).groupBy(bucket_col))
        .applyInPandas(merge, BLOOM_SCHEMA)
    )


def bloom_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    key_col: str = "url_hash",
    bucket_col: str = "bucket",
    blooms: Optional[DataFrame] = None,
    transients: Optional[list] = None,
) -> DataFrame:
    """candidates ∖ seen on key_col, Bloom-prefiltered per bucket.

    Equal to ``candidates.join(seen, key, "left_anti")`` (no false
    negatives).  Both stages are bucket-cogrouped: the probe task gets one
    bucket's candidates + that bucket's filter; the exact check gets the
    maybe-positives + that bucket's seen keys.  Nothing is collected to or
    broadcast from the driver.

    Pass a prebuilt/persisted ``blooms`` DataFrame (see
    ``bloom_or_new_keys``) to skip rebuilding filters from the seen-set.

    The probe intermediate is persisted (two consumers read it).  Its
    handle lands in ``transients`` when given, else in the module-global
    list drained by ``unpersist_transients()`` — callers that materialize
    the result MUST release it one of those two ways, or a long-lived
    driver accumulates cached blocks (FrontierDedup.ingest does this every
    snapshot).
    """
    if blooms is None:
        blooms = build_bloom_per_bucket(seen, key_col, bucket_col)

    cand_fields = candidates.schema.fields
    cand_cols = [f.name for f in cand_fields]
    flagged_schema = T.StructType(list(cand_fields) + [T.StructField("_maybe_seen", T.BooleanType())])

    def probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cand_cols + ["_maybe_seen"])
        out = cand_pdf[cand_cols].copy()
        if bloom_pdf.empty:
            out["_maybe_seen"] = False  # no filter ⇒ bucket has no seen keys
            return out
        bloom = np.frombuffer(bloom_pdf["bloom"].iloc[0], dtype=np.uint8)
        m = int(bloom_pdf["m_bits"].iloc[0])
        keys = cand_pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
        out["_maybe_seen"] = _might_contain(bloom, keys, m)
        return out

    flagged = (
        candidates.groupBy(bucket_col)
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(probe, flagged_schema)
        .persist()  # two consumers below — probe exactly once
    )
    (transients if transients is not None else _TRANSIENT).append(flagged)
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")

    # Exact check, scan-only: the maybe-positive key set is small (true
    # dupes + ~p·|new| false positives), so broadcast it against the
    # seen-set scan (left-semi keeps only the true dupes — seen is never
    # shuffled), then drop those dupes from the maybe-positives.
    maybe_keys = needs_check.select(key_col).distinct()
    true_dupes = seen.select(key_col).join(F.broadcast(maybe_keys), key_col, "left_semi")
    checked = needs_check.join(F.broadcast(true_dupes), key_col, "left_anti")
    return definitely_new.unionByName(checked)
