"""DuckDB oracle-SQL builders for the kernel-heavy gates.

These generate ANSI-ish SQL that INDEPENDENTLY recomputes, in DuckDB's
HUGEINT arithmetic, what the engine's numpy kernels compute — winnowing
fingerprints (operators/textstats.doc_fingerprint) and 64-bit SimHash
signatures (operators/dedup.simhash_batch) — so the driver's value-hash
gate certifies the kernels and their distributed plans against a
from-scratch SQL reimplementation, not against themselves.

64-bit wraparound arithmetic in SQL: unsigned values are carried as
HUGEINT in [0, 2^64); multiplication is taken mod 2^64 (with a split
multiply when the constant is near 2^64, since INT128 would overflow);
XOR round-trips through signed BIGINT (bit pattern preserved).
"""

from __future__ import annotations

import numpy as np

_TWO64 = "18446744073709551616"
_TWO63 = "9223372036854775808"


def _sgn(x: str) -> str:
    """HUGEINT-held u64 → its signed-BIGINT bit pattern."""
    return (
        f"(CASE WHEN {x} >= {_TWO63}::HUGEINT"
        f" THEN ({x} - {_TWO64}::HUGEINT)::BIGINT ELSE ({x})::BIGINT END)"
    )


def _uns(x: str) -> str:
    """Signed BIGINT bit pattern → HUGEINT-held u64."""
    return (
        f"(CASE WHEN ({x}) < 0 THEN ({x})::HUGEINT + {_TWO64}::HUGEINT"
        f" ELSE ({x})::HUGEINT END)"
    )


def _xor64(a: str, b: str) -> str:
    """Full 64-bit XOR of two HUGEINT-held u64 values."""
    return _uns(f"xor({_sgn(a)}, {_sgn(b)})")


def winnowing_fingerprint_sql(threshold_note: str = "") -> str:
    """SQL recomputation of doc_fingerprint (textstats.py): FNV-1a 64 per
    word → sliding-window(8) minima (all hashes when <8 words) → XOR-mul
    fold over the sorted distinct minima.  ASCII-only rows (the kernel
    hashes UTF-8 bytes; ord() only matches bytes for ASCII)."""
    fnv_prime = 1099511628211
    xbyte = _uns("xor((acc % 256)::BIGINT, b::BIGINT)")
    fnv = (
        "list_reduce(\n"
        "  list_prepend(CAST(14695981039346656037 AS HUGEINT),\n"
        "               list_transform(range(1, length(w) + 1),"
        " i -> ord(substr(w, i, 1)))),\n"
        f"  (acc, b) -> ((acc - (acc % 256) + {xbyte}) * {fnv_prime})"
        f" % {_TWO64}::HUGEINT\n)"
    )
    xor_mul = (
        f"(({_xor64('acc', 'x')}) * {fnv_prime}) % {_TWO64}::HUGEINT"
    )
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS arr
  FROM documents WHERE regexp_matches(text, '\\A[ -~]*\\z')
), words AS (
  SELECT doc_id, i AS pos, arr[i] AS w, len(arr) AS n
  FROM docs, UNNEST(range(1, len(arr) + 1)) t(i)
), hashes AS (
  SELECT doc_id, pos, n, {fnv} AS h FROM words
), winmins AS (
  SELECT DISTINCT doc_id, m FROM (
    SELECT doc_id, pos, n,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m
    FROM hashes) WHERE n >= 8 AND pos <= n - 7
  UNION
  SELECT DISTINCT doc_id, h AS m FROM hashes WHERE n < 8
), folded AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT),
                                  list_sort(list(m))),
                     (acc, x) -> {xor_mul}) AS acc
  FROM winmins GROUP BY doc_id
)
SELECT doc_id, {_sgn('acc')} AS fingerprint FROM folded
"""


# SimHash constants — must mirror operators/dedup.py simhash_batch
_B = 1099511628211  # shingle-hash polynomial base (_shingle_hashes)
_B2 = (_B * _B) % (1 << 64)
_B3 = (_B * _B * _B) % (1 << 64)
_C1 = 0xFF51AFD7ED558CCD  # fmix multiplier


def _simhash_salt(seed: int = 42) -> int:
    return int(np.uint64(np.random.default_rng([seed, 911]).integers(1, 1 << 62)))


def simhash_allpairs_sql(union_corpus_cte: str, max_hamming: int = 3) -> str:
    """SQL recomputation of simhash_batch from TEXT (k=4 byte shingles →
    distinct → salt-multiply → murmur fmix → per-bit majority vote) plus a
    brute-force all-pairs hamming join — the exact answer the pigeonhole
    4×16-bit chunk blocking must reproduce.

    ``union_corpus_cte`` must define a CTE named ``allv(doc_id, t)`` with
    t already lowercased (ASCII text only)."""
    salt = _simhash_salt()
    roll = (
        f"(ord(substr(t, i, 1))::HUGEINT * {_B3}"
        f" + ord(substr(t, i+1, 1))::HUGEINT * {_B2}"
        f" + ord(substr(t, i+2, 1))::HUGEINT * {_B}"
        f" + ord(substr(t, i+3, 1))::HUGEINT) % {_TWO64}::HUGEINT"
    )
    s1 = f"((s * {salt}) % {_TWO64}::HUGEINT)"
    s2 = _xor64("a", "(a // 8589934592::HUGEINT)")  # a ^ (a >> 33)
    # b * C1 mod 2^64: C1 ~ 2^64, so split-multiply to stay inside INT128
    s3 = (
        f"((((b // 4294967296::HUGEINT) * {_C1} % 4294967296::HUGEINT)"
        f" * 4294967296::HUGEINT + (b % 4294967296::HUGEINT) * {_C1})"
        f" % {_TWO64}::HUGEINT)"
    )
    s4 = _xor64("c", "(c // 536870912::HUGEINT)")  # c ^ (c >> 29)
    return f"""
WITH {union_corpus_cte}
, sh AS (
  SELECT DISTINCT doc_id, {roll} AS s
  FROM allv, UNNEST(range(1, greatest(length(t) - 3, 1) + 1)) u(i)
), f1 AS (SELECT doc_id, {s1} AS a FROM sh),
   f2 AS (SELECT doc_id, {s2} AS b FROM f1),
   f3 AS (SELECT doc_id, {s3} AS c FROM f2),
   f4 AS (SELECT doc_id, {s4} AS x FROM f3),
   bits AS (
  SELECT doc_id, j,
         sum(((x // power(2::HUGEINT, j)::HUGEINT) % 2)::BIGINT) AS ones,
         count(*) AS n
  FROM f4, UNNEST(range(0, 64)) v(j)
  GROUP BY doc_id, j
), sig AS (
  SELECT doc_id,
         {_sgn('sum(CASE WHEN ones * 2 > n THEN power(2::HUGEINT, j)::HUGEINT ELSE 0::HUGEINT END)')} AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def minhash_exact_jaccard_sql(threshold: float = 0.6) -> str:
    """Exact char-5-gram Jaccard over the planted union corpus (documents ∪
    90%-prefix copies at doc_id+100000): the pair set the banded
    MinHash-LSH pipeline must reproduce.  The corpus's measured J
    distribution has a clean gap around the threshold (no pair in
    (0.35, 0.80) at sf0.01), so the 64-hash estimate can never disagree
    with the exact answer about membership."""
    return f"""
WITH allv AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         lower(substr(text, 1, CAST(floor(length(text) * 0.9) AS INT))) AS t
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS g
  FROM allv, UNNEST(range(1, greatest(length(t) - 4, 1) + 1)) u(i)
), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM grams a JOIN grams b USING (g)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
"""


def compose_keepset_sql(threshold: float = 0.6) -> str:
    """Independent recompute of the FULL composition pass
    (plans/corpus_pipeline.py::compose_training_set) over the planted
    margin-gap corpus: exact char-5-gram Jaccard pairs at ``threshold`` →
    connected components via a recursive-CTE transitive closure →
    keep-best (quality = char length, DESC; ties by lowest id).  The
    engine runs the banded MinHash-LSH grouping path; the corpus's
    measured Jaccard margin gap around the threshold means any banding
    recall miss, component-label drift, or keep-best tie-break change
    turns the gate red."""
    return f"""
WITH RECURSIVE allv AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         lower(substr(text, 1, CAST(floor(length(text) * 0.9) AS INT))) AS t
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS g
  FROM allv, UNNEST(range(1, greatest(length(t) - 4, 1) + 1)) u(i)
), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM grams a JOIN grams b USING (g)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
), comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
members AS (
  SELECT allv.doc_id AS doc_id, coalesce(comp.component, allv.doc_id) AS cmp,
         length(allv.t) AS q
  FROM allv LEFT JOIN comp ON allv.doc_id = comp.id
), ranked AS (
  SELECT doc_id, row_number() OVER (PARTITION BY cmp ORDER BY q DESC, doc_id) AS rk
  FROM members
)
SELECT doc_id FROM ranked WHERE rk = 1
"""


SIMHASH_UNION_CTE = """allv AS (
  SELECT doc_id, lower(text) AS t FROM documents
  WHERE regexp_matches(text, '\\A[ -~]*\\z')
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, lower(text || ' x') AS t FROM documents
  WHERE regexp_matches(text, '\\A[ -~]*\\z')
)"""
