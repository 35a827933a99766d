"""Spark-facing vectorized wrappers for the canonicalization kernel.

Batches flow through Arrow (pandas UDF); the murmur URL hash is numpy-
vectorized over the whole batch (canon/murmur.py), string parsing runs in
optimized Python per batch — no row-at-a-time ``udf()`` anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..canon.murmur import hash_url_parts_batch
from ..canon.url import parse_url

CANON_STRUCT = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("top_domain", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("param", T.StringType()),
        T.StructField("url_hash", T.LongType()),
    ]
)


@pandas_udf(CANON_STRUCT)
def canonicalize(urls: pd.Series) -> pd.DataFrame:
    n = len(urls)
    out = {
        "url_canon": [None] * n,
        "domain": [None] * n,
        "top_domain": [None] * n,
        "path": [None] * n,
        "param": [None] * n,
    }
    doms, paths, params, idxs = [], [], [], []
    for i, raw in enumerate(urls):
        u = parse_url(raw)
        if u is None:
            continue
        out["url_canon"][i] = str(u)
        out["domain"][i] = u.domain.address
        out["top_domain"][i] = u.domain.top_domain
        out["path"][i] = u.path
        out["param"][i] = u.param
        doms.append(u.domain.address)
        paths.append(u.path)
        params.append(u.param)
        idxs.append(i)
    hashes = pd.array([None] * n, dtype="Int64")
    if idxs:
        hs = hash_url_parts_batch(doms, paths, params)  # vectorized numpy
        for j, i in enumerate(idxs):
            hashes[i] = int(hs[j])
    res = pd.DataFrame(out)
    res["url_hash"] = hashes
    return res


def url_hash_col(url_col: Column) -> Column:
    return canonicalize(url_col)["url_hash"]
