#!/usr/bin/env python
"""Synthesize a measurement-only ~sf1.0 bench corpus = 10x the driver's
sf0.1 tables, used for local before/after timing at the driver's round-end
measurement scale (BENCH_r05 ran at sf1.0).  NOT read by any declared
query, gate, oracle or committed bench artifact's inputs — bench.py only
sees it when SPARK_GRAFT_SF_DIR points at the output dir explicitly.

Fidelity choices (structural, per OPTIMIZATION_r06.md):
- keys replica-shifted so FK joins stay consistent within a replica;
- document text goes through a per-replica letter-substitution cipher so
  replicas are NOT near-dups of each other (shingle spaces disjoint)
  while each replica keeps the driver corpus's internal dup structure;
- embeddings perturbed per replica (fresh vectors, same geometry);
- documents/events/customer/embeddings written as ONE parquet row group
  (the driver's observed sf1.0 file shape — the single-row-group
  parallelism trap); lineitem/orders get DuckDB-like ~122,880-row groups
  (their driver files scan in parallel, per the r5 bench profile).

Usage: python tools/make_bench_sf1.py [SRC_sf0.1_dir] [DST_dir]
"""
from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/sfgen/sf1.0"
REPS = 10


def cipher_table(rep: int) -> bytes:
    rng = np.random.default_rng([20260822, rep])
    lower = np.frombuffer(string.ascii_lowercase.encode(), dtype=np.uint8)
    upper = np.frombuffer(string.ascii_uppercase.encode(), dtype=np.uint8)
    pl = rng.permutation(26)
    table = np.arange(256, dtype=np.uint8)
    if rep > 0:
        table[lower] = lower[pl]
        table[upper] = upper[pl]
    return table.tobytes()


def write(tbl: pa.Table, path: str, row_group_size: int | None = None):
    pq.write_table(
        tbl, path,
        row_group_size=row_group_size or max(tbl.num_rows, 1),
        compression="snappy",
    )


def repl_table(name, key_shifts, text_cols=(), row_group_size=None):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for rep in range(REPS):
        cols = {}
        for cn in t.column_names:
            col = t.column(cn)
            if cn in key_shifts:
                cols[cn] = pa.compute.add(col, key_shifts[cn] * rep)
            elif cn in text_cols and rep > 0:
                tab = cipher_table(rep)
                cols[cn] = pa.array(
                    [None if v is None else v.translate(tab) for v in col.to_pylist()],
                    type=col.type,
                )
            else:
                cols[cn] = col
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    write(out, f"{DST}/{name}.parquet", row_group_size)
    print(name, out.num_rows)


def main():
    os.makedirs(DST, exist_ok=True)
    repl_table("documents", {"doc_id": 5000}, text_cols=("text",))
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    parts = []
    for rep in range(REPS):
        vid = pa.compute.add(t.column("vec_id"), 2000 * rep)
        emb = t.column("embedding")
        if rep > 0:
            rng = np.random.default_rng([777, rep])
            flat = np.array(emb.to_pylist(), dtype=np.float32)
            flat = flat + rng.normal(0, 0.05, size=flat.shape).astype(np.float32)
            emb = pa.array(list(flat), type=emb.type)
        parts.append(pa.table({"vec_id": vid, "embedding": emb}))
    write(pa.concat_tables(parts), f"{DST}/embeddings.parquet")
    print("embeddings", REPS * t.num_rows)

    repl_table("events", {"event_id": 100000, "user_id": 15000})
    repl_table("orders", {"o_orderkey": 600000, "o_custkey": 15000},
               row_group_size=122880)
    repl_table("lineitem",
               {"l_orderkey": 600000, "l_partkey": 20000, "l_suppkey": 1000},
               row_group_size=122880)
    repl_table("customer", {"c_custkey": 15000})
    repl_table("part", {"p_partkey": 20000})
    repl_table("supplier", {"s_suppkey": 1000})
    for small in ("nation", "region"):
        write(pq.read_table(f"{SRC}/{small}.parquet"), f"{DST}/{small}.parquet")
        print(small, "copied")


if __name__ == "__main__":
    main()
