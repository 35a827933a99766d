#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule.

The authoritative criterion is ≥0.8 throughput scaling efficiency from N
to 4N executors.  This sandbox has no multi-node cluster, so (per the
driver instruction) the identical crawl job runs at two local parallelism
levels — local[N] and local[4N] — over the same synthetic input, and we
report throughput at both plus efficiency = T_N→4N speedup / 4.

Prints one JSON line and appends a markdown section to BENCH.md.

Env knobs: SPARK_GRAFT_SCALE_N (default 8 → compares local[8] vs
local[32]), SPARK_GRAFT_CRAWL_DOMAINS (default 96),
SPARK_GRAFT_CRAWL_PAGES (default 60).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402

from bench import build_spark, run_crawl_bench  # noqa: E402


def _make_warm_udf():
    from pyspark.sql.pandas.functions import pandas_udf

    def ident(x: pd.Series) -> pd.Series:
        return x

    ident.__annotations__ = {"x": pd.Series, "return": pd.Series}
    return pandas_udf(ident, "long")


def crawl_at(cpus: int, n_domains: int, mean_pages: int):
    spark = build_spark(cpus)
    try:
        # warm the JVM and spawn the Python workers so one-time startup
        # cost doesn't contaminate the throughput measurement
        from pyspark.sql import functions as F

        warm = _make_warm_udf()
        spark.range(cpus * 64).repartition(cpus * 2).select(
            warm(F.col("id"))
        ).count()
        wall, visited, seen = run_crawl_bench(spark, n_domains, mean_pages)
        return wall, visited, seen
    finally:
        spark.stop()


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    n_domains = int(os.environ.get("SPARK_GRAFT_CRAWL_DOMAINS", "2048"))
    mean_pages = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "50"))

    wall_n, visited_n, seen_n = crawl_at(n, n_domains, mean_pages)
    wall_4n, visited_4n, seen_4n = crawl_at(4 * n, n_domains, mean_pages)
    assert visited_n == visited_4n, "same input must produce the same crawl"

    tput_n = visited_n / wall_n
    tput_4n = visited_4n / wall_4n
    efficiency = (tput_4n / tput_n) / 4.0

    result = {
        "metric": "crawl throughput scaling efficiency, local[N] → local[4N]",
        "n_cores": n,
        "4n_cores": 4 * n,
        "domains": n_domains,
        "urls_visited": visited_n,
        "urls_seen": seen_n,
        "wall_sec_n": round(wall_n, 2),
        "wall_sec_4n": round(wall_4n, 2),
        "urls_per_sec_n": round(tput_n, 2),
        "urls_per_sec_4n": round(tput_4n, 2),
        "speedup": round(tput_4n / tput_n, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(result))

    md = (
        "\n## Scaling evidence (north rule row 12)\n\n"
        f"Identical crawl job (synthetic web, {n_domains} domains, "
        f"{visited_n} URLs visited / {seen_n} URLs seen+deduped) on the "
        "same input at two parallelism levels:\n\n"
        "| parallelism | wall (s) | URLs fetched+deduped/s |\n|---|---|---|\n"
        f"| local[{n}] | {wall_n:.2f} | {tput_n:.1f} |\n"
        f"| local[{4*n}] | {wall_4n:.2f} | {tput_4n:.1f} |\n\n"
        f"**Speedup {tput_4n / tput_n:.2f}× → scaling efficiency "
        f"{efficiency:.3f}** (criterion ≥ 0.8 would equal 4× speedup; "
        "see BASELINE.md row 12).\n"
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
