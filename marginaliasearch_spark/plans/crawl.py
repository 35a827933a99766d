"""The wave-iterative Spark crawl engine.

Architecture (SURVEY.md §3, §7): the crawl state lives in tables —

- ``frontier``      (domain, bucket, url_hash, url, seq, state) — the
                    per-domain queue (QUEUED rows, seq-ordered) plus the
                    URL-seen set (KNOWN/VISITED rows keyed by the bit-exact
                    64-bit hash);
- ``domain_state``  (domain, phase, state_json, info_json) — robots rules,
                    link-filter kind, depth, error budget, virtual clock;
- ``crawl_data`` / ``fetch_log`` / ``visits`` — append-only outputs.

Each wave cogroups the state tables with the domain's web pages (the
synthetic stand-in for HTTP; in production the fetch happens inside the
UDF against the live site) and advances every active domain's
DomainCrawlSession by up to ``wave_budget`` fetches.  Domains never link
to each other inside a job (the reference's key invariant — cp/readme.md
§1), so the grouping key ``domain`` makes the whole crawl embarrassingly
parallel: the only shuffles are the cogroup hash-partitioning per wave,
exactly one wide stage.

Each wave boundary is an atomic snapshot commit (plans/checkpoints.py) —
kill the driver at any point and ``resume()`` continues from the last
committed wave with identical results (tested).

Scale notes (10^10-URL frontier / 1000 executors):
- frontier and the wave cogroup hash-partition on ``domain``; AQE splits
  skewed partitions; the ``bucket`` column (xxhash64(domain) % n_buckets)
  is the Iceberg partition spec so a wave's COW replace only rewrites
  dirty buckets;
- per-domain state is bounded by the reference's own frontier cap
  (depth + 10_000 rows — DomainCrawlFrontier.java:167-169), so a group
  never exceeds ~20k rows no matter how large the site;
- the politeness budget makes >1 fetch/s/domain impossible, so wave
  throughput scales with the number of *domains* per executor, not URLs —
  which is why grouping by domain (not URL) is the right unit of work.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle.session import DomainCrawlSession, DomainInfo
from ..sources.synthetic_web import DomainPagesWeb
from .checkpoints import SnapshotCatalog

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------

STATE_IN_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("row_kind", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("state_json", T.StringType()),
        T.StructField("info_json", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("etag", T.StringType()),
        T.StructField("last_modified", T.StringType()),
        T.StructField("lsh64", T.LongType()),
    ]
)

WAVE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("row_kind", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("state_json", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("etag", T.StringType()),
        T.StructField("last_modified", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("virtual_ms", T.LongType()),
        T.StructField("idx", T.LongType()),
        T.StructField("url2", T.StringType()),  # edge rows: url=src, url2=dst
        T.StructField("phash", T.LongType()),    # inline payload validation
        T.StructField("psnr_ok", T.IntegerType()),
        T.StructField("lsh64", T.LongType()),    # content fingerprint (revisit)
        T.StructField("has_cookies", T.IntegerType()),  # Slop `cookies` column
        # Slop at-rest parity (SlopCrawlDataRecord.java:35-54)
        T.StructField("ip", T.StringType()),
        T.StructField("timestamp", T.LongType()),       # epoch millis (virtual)
        T.StructField("request_time_ms", T.IntegerType()),
        T.StructField("header", T.StringType()),        # raw header block
    ]
)

_OUT_COLS = [f.name for f in WAVE_OUT_SCHEMA.fields]


def _row(row_kind: str, domain: str, **kw) -> dict:
    base = {c: None for c in _OUT_COLS}
    base["row_kind"] = row_kind
    base["domain"] = domain
    base.update(kw)
    return base


_INT64_COLS = ("url_hash", "seq", "virtual_ms", "idx", "phash", "lsh64", "timestamp")
_INT32_COLS = ("http_status", "psnr_ok", "has_cookies", "request_time_ms")


def _assemble_out(domain: str, blocks: list) -> pd.DataFrame:
    """Columnar wave-output builder: each block is (n_rows, {col: list |
    scalar}) for one homogeneous row kind; absent columns fill with
    nulls.  Replaces the per-row 25-key dict assembly (measured ~2/3 of
    the whole wave UDF wall at 512 domains — guide §1.2 step 2, per-task
    work).  Int columns go straight to pandas nullable Int64/Int32 so a
    null can never decay the column to float64 and corrupt 64-bit
    hashes — the same invariant the old dtype=object + astype path
    enforced, minus the object detour."""
    data = {}
    for c in _OUT_COLS:
        vals: list = []
        for cnt, cols in blocks:
            v = cols.get(c)
            if v is None:
                vals.extend([None] * cnt)
            elif isinstance(v, (list, range)):
                vals.extend(v)
            else:
                vals.extend([v] * cnt)
        if c == "domain":
            data[c] = pd.Series([domain] * sum(b[0] for b in blocks), dtype=object)
        elif c in _INT64_COLS:
            data[c] = pd.array(vals, dtype="Int64")
        elif c in _INT32_COLS:
            data[c] = pd.array(vals, dtype="Int32")
        else:
            data[c] = pd.Series(vals, dtype=object)
    return pd.DataFrame(data, columns=_OUT_COLS)


def _schedule_offsets(durations: list[tuple[str, int]], permits: int) -> dict[str, int]:
    """Greedy list scheduling of per-domain crawl durations onto `permits`
    concurrent slots with a ≥1 s cadence between lock grants — the virtual-
    clock model of the reference's per-top-domain semaphore
    (LocalDomainCoordinator.java:22-122).  Returns start offsets (ms)."""
    import heapq

    slots = [0] * max(permits, 1)
    heapq.heapify(slots)
    offsets: dict[str, int] = {}
    last_grant = -1000
    for name, dur in durations:  # caller passes a deterministic order
        free_at = heapq.heappop(slots)
        start = max(free_at, last_grant + 1000)
        offsets[name] = start
        last_grant = start
        heapq.heappush(slots, start + dur)
    return offsets


def _make_wave_fn(
    wave_budget: Optional[int],
    seed: int,
    validate_payload: bool = False,
    transport: Optional[dict] = None,
    body_cap_bytes: Optional[int] = None,
):
    """Build the cogrouped wave UDF (runs once per domain per wave).

    Fault isolation: an exception while crawling one domain (bad state,
    malformed robots, codec error) terminates that domain with
    phase='error' and the exception recorded in its state_json — it never
    fails the whole wave task (the reference likewise catches per-domain
    exceptions in CrawlTask — CrawlerMain.java:700-716)."""

    def wave_fn(state_pdf: pd.DataFrame, pages_pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            return _wave_fn_inner(state_pdf, pages_pdf)
        except Exception as ex:  # noqa: BLE001 — per-domain fault barrier
            ds_rows = state_pdf[state_pdf.row_kind == "domain_state"]
            domain = ds_rows["domain"].iloc[0] if not ds_rows.empty else "?"
            err = json.dumps({"phase": "error", "exception": repr(ex)[:500]})
            pdf = pd.DataFrame(
                [_row("domain_state", domain, state="error", state_json=err)],
                columns=_OUT_COLS,
                dtype=object,
            )
            for col in ("url_hash", "seq", "virtual_ms", "idx"):
                pdf[col] = pdf[col].astype("Int64")
            pdf["http_status"] = pdf["http_status"].astype("Int32")
            return pdf

    def _wave_fn_inner(state_pdf: pd.DataFrame, pages_pdf: pd.DataFrame) -> pd.DataFrame:
        if state_pdf.empty:
            return pd.DataFrame(columns=_OUT_COLS)

        ds_rows = state_pdf[state_pdf.row_kind == "domain_state"]
        if ds_rows.empty:
            return pd.DataFrame(columns=_OUT_COLS)
        ds = ds_rows.iloc[0]
        domain = ds["domain"]
        info_d = json.loads(ds["info_json"])
        info = DomainInfo(
            domain=domain,
            proto=info_d.get("proto") or "https",
            probe=info_d.get("probe") or "error",
            robots_txt=info_d.get("robots_txt"),
            site_kind=info_d.get("site_kind") or "default",
            generator_meta=info_d.get("generator_meta") or "",
            has_lemmy_config=bool(info_d.get("has_lemmy_config")),
            sitemap_urls=info_d.get("sitemap_urls") or [],
            crawl_depth=int(info_d.get("crawl_depth") or 1000),
            seed_urls=info_d.get("seed_urls") or [],
        )

        if transport is not None and transport.get("kind") == "http":
            # REAL-SOCKET transport (sources/httpweb.py): the executor's
            # Python worker opens live HTTP connections instead of reading
            # the cogrouped pandas slice; pages_pdf degenerates to routing
            # ballast (pass an empty pages DF to run_waves in this mode).
            # tests/test_httpweb_engine.py proves the wave outputs are
            # byte-identical to the pandas transport on the same web.
            from ..sources.httpweb import HttpWeb

            web = HttpWeb(
                transport["ports"], host=transport.get("host", "127.0.0.1")
            )
        else:
            web = DomainPagesWeb(domain, info.proto, pages_pdf)

        state_json = ds["state_json"]
        if state_json is None or (isinstance(state_json, float)):
            # fresh domain: setup (+ recrawl replay if prev data present)
            # replay order = stored order (the reference iterates the prior
            # Slop table sequentially); `seq` carries the position
            prev_rows = state_pdf[state_pdf.row_kind == "prev_crawl"].sort_values("seq")
            if not prev_rows.empty:
                pr = prev_rows[
                    ["url", "http_status", "image_id", "etag", "last_modified", "lsh64"]
                ].copy()
                pr["http_status"] = pr["http_status"].astype(int)
                # NaN (pandas null) → None so the session sees real absent tags
                pr = pr.astype(object).where(pd.notnull(pr), None)
                # lsh64 travels as a never-null long (sentinel 0 = absent) so
                # Arrow→pandas cannot decay it to float64 and corrupt the bits
                prev = [
                    {
                        **r,
                        "lsh64": (
                            int(r["lsh64"]) if r["lsh64"] not in (None, 0) else None
                        ),
                    }
                    for r in pr.to_dict("records")
                ]
            else:
                prev = None
            atag_rows = state_pdf[state_pdf.row_kind == "atag"].sort_values("seq")
            atags = atag_rows["url"].tolist() if not atag_rows.empty else None
            sess = DomainCrawlSession(
                info,
                web,
                seed=seed,
                validate_payload=validate_payload,
                **({"body_cap_bytes": body_cap_bytes} if body_cap_bytes else {}),
            )
            phase = sess.setup(prev_crawl=prev, atag_urls=atags)
        else:
            fr = state_pdf[state_pdf.row_kind == "frontier"]
            frontier_rows = fr[["url_hash", "url", "seq", "state"]].to_dict("records")
            sess = DomainCrawlSession.rehydrate(
                info,
                web,
                state_json,
                frontier_rows,
                seed=seed,
                **({"body_cap_bytes": body_cap_bytes} if body_cap_bytes else {}),
            )
            sess.validate_payload = validate_payload
            phase = sess.phase

        if phase == "active":
            phase = sess.run(max_fetches=wave_budget)

        crawl_data, fetch_log, visits = sess.drain()
        edges = sess.drain_edges()
        # columnar assembly (block order = the old row order: edge,
        # fetch_log, visit, crawl_data, frontier, domain_state)
        blocks: list = []
        if edges:
            blocks.append(
                (
                    len(edges),
                    {
                        "row_kind": "edge",
                        "url": [e[0] for e in edges],
                        "url2": [e[1] for e in edges],
                        "idx": range(len(edges)),
                    },
                )
            )
        if fetch_log:
            blocks.append(
                (
                    len(fetch_log),
                    {
                        "row_kind": "fetch_log",
                        "url": [r["url"] for r in fetch_log],
                        "action": [r["action"] for r in fetch_log],
                        "http_status": [int(r["status"]) for r in fetch_log],
                        "virtual_ms": [int(r["virtual_ms"]) for r in fetch_log],
                        "idx": range(len(fetch_log)),
                    },
                )
            )
        if visits:
            blocks.append(
                (
                    len(visits),
                    {"row_kind": "visit", "url": list(visits), "idx": range(len(visits))},
                )
            )
        if crawl_data:
            blocks.append(
                (
                    len(crawl_data),
                    {
                        "row_kind": "crawl_data",
                        "idx": range(len(crawl_data)),
                        "url": [r["url"] for r in crawl_data],
                        "http_status": [int(r["http_status"]) for r in crawl_data],
                        "content_type": [r["content_type"] for r in crawl_data],
                        "image_id": [r["image_id"] for r in crawl_data],
                        "etag": [r["etag"] for r in crawl_data],
                        "last_modified": [r["last_modified"] for r in crawl_data],
                        "phash": [r.get("phash") for r in crawl_data],
                        "psnr_ok": [
                            (None if "psnr_ok" not in r else int(r["psnr_ok"]))
                            for r in crawl_data
                        ],
                        "lsh64": [r.get("lsh64") for r in crawl_data],
                        "has_cookies": [int(r.get("has_cookies", 0)) for r in crawl_data],
                        "ip": [r.get("ip") for r in crawl_data],
                        "timestamp": [r.get("timestamp") for r in crawl_data],
                        "request_time_ms": [r.get("request_time_ms") for r in crawl_data],
                        "header": [r.get("header") for r in crawl_data],
                    },
                )
            )
        frontier_out = sess.frontier_rows()
        if phase != "active":
            # terminal: keep only the seen-set (lineage/recrawl input),
            # drop the queue
            frontier_out = [r for r in frontier_out if r["state"] != "QUEUED"]
        if frontier_out:
            blocks.append(
                (
                    len(frontier_out),
                    {
                        "row_kind": "frontier",
                        "url_hash": [int(r["url_hash"]) for r in frontier_out],
                        "url": [r["url"] for r in frontier_out],
                        "seq": [int(r["seq"]) for r in frontier_out],
                        "state": [r["state"] for r in frontier_out],
                    },
                )
            )
        blocks.append(
            (1, {"row_kind": "domain_state", "state": phase, "state_json": sess.state_json()})
        )
        return _assemble_out(domain, blocks)

    return wave_fn


OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("offset_ms", T.LongType()),
    ]
)


def _make_offsets_fn():
    """Per-top-domain token-budget schedule (wordpress.com 16, blogspot 8,
    substack 1, default 2 — LocalDomainCoordinator.java:88-100) as a SMALL
    post-wave pass: this derives each member's virtual-clock start offset
    from the greedy list schedule of their crawl durations onto `permits`
    slots with the 1 s grant cadence.  Offsets land in a side table the
    fetch_log view applies — the audit-trail timestamps reflect the
    semaphore's grant times.  The permit bound itself is enforced
    PHYSICALLY by the per-wave slot claim in ``_run_waves_inner`` (≤
    permits members advance per wave); this pass adds the clock model on
    top, and a blogspot.com-scale top-domain never serializes its
    thousands of members into one task (the wave groups by domain)."""
    from ..operators.scheduling import DEFAULT_PERMITS, TOP_DOMAIN_PERMITS

    def offsets_fn(key, pdf):  # (key, pdf) form — no hints, or Spark warns
        top = key[0]
        permits = TOP_DOMAIN_PERMITS.get(top, DEFAULT_PERMITS)
        durations = [
            (r["domain"], int(max(r["dur_ms"], 0)))
            for _, r in pdf.sort_values("domain").iterrows()
        ]
        offs = _schedule_offsets(durations, permits)
        return pd.DataFrame(
            {"domain": list(offs.keys()), "offset_ms": list(offs.values())}
        )

    return offsets_fn


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------


class SparkCrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        seed: int = 42,
        n_buckets: int = 32,
        validate_inline: bool = False,
        global_request_cap: Optional[int] = None,
        conn_launches_per_wave: Optional[int] = None,
        transport: Optional[dict] = None,
        body_cap_bytes: Optional[int] = None,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.catalog = SnapshotCatalog(out_dir)
        self.seed = seed
        self.n_buckets = n_buckets
        self.validate_inline = validate_inline
        # opt-in politeness analogues of the reference's two global
        # throttles (both default OFF — they are single-JVM niceness
        # mechanisms, meaningless for result semantics):
        #  - global_request_cap: HttpFetcherImpl's 512-permit global
        #    request semaphore (ref: crawling-process/java/nu/marginalia/
        #    crawl/fetcher/HttpFetcherImpl.java `requestSema`) — since a
        #    domain session runs one request at a time, the cap bounds
        #    concurrently-fetching DOMAINS; the wave analogue is "at most
        #    N domains advance per scheduling quantum".
        #  - conn_launches_per_wave: the connection-launch throttle that
        #    staggers NEW connections on startup (CrawlerMain's task-spawn
        #    pacing) — wave analogue: at most C domains may transition
        #    pending→active per wave.
        # a cap of 0 would make every wave's runnable set empty and the
        # run loop would "complete" having fetched nothing — reject it
        # here rather than silently reporting an empty successful crawl
        if global_request_cap is not None and global_request_cap < 1:
            raise ValueError(f"global_request_cap must be >= 1, got {global_request_cap}")
        if conn_launches_per_wave is not None and conn_launches_per_wave < 1:
            raise ValueError(
                f"conn_launches_per_wave must be >= 1, got {conn_launches_per_wave}"
            )
        self.global_request_cap = global_request_cap
        self.conn_launches_per_wave = conn_launches_per_wave
        # fetch transport for the wave UDF: None = the cogrouped pandas
        # slice (hermetic default); {"kind": "http", "ports": {proto:
        # port}, "host": ...} = real sockets via sources/httpweb.HttpWeb
        # (executors dial the address — on a cluster this must be a
        # host reachable from every executor, not 127.0.0.1)
        self.transport = transport
        # None = the reference's 32 MB constant (session default); a gate
        # fixture overrides it to test the clip boundary at small scale
        self.body_cap_bytes = body_cap_bytes
        # the bucket layout is a property of the PERSISTED run, not the
        # instance: a resume engine constructed with a different n_buckets
        # would re-derive wrong bucket keys and corrupt the frontier COW
        self._ctor_n_buckets, self._ctor_seed = n_buckets, seed
        cfg = os.path.join(out_dir, "engine.json")
        if os.path.exists(cfg):
            with open(cfg) as f:
                persisted = json.load(f)
            self.n_buckets = int(persisted.get("n_buckets", n_buckets))
            self.seed = int(persisted.get("seed", seed))

    def _write_engine_config(self) -> None:
        cfg = os.path.join(self.out_dir, "engine.json")
        with open(cfg, "w") as f:
            json.dump({"n_buckets": self.n_buckets, "seed": self.seed}, f)

    # -- helpers ---------------------------------------------------------

    def _bucket(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def _read(self, table: str) -> Optional[DataFrame]:
        if table == "crawl_data":
            return self._wave_view(
                "crawl_data",
                ["domain", "url", "http_status", "content_type", "image_id",
                 "etag", "last_modified", "phash", "psnr_ok", "lsh64",
                 "has_cookies", "ip", "timestamp", "request_time_ms",
                 "header", "wave", "idx"],
            )
        if table == "fetch_log":
            v = self._wave_view(
                "fetch_log", ["domain", "url", "action", "http_status", "virtual_ms", "idx", "wave"]
            )
            offp = self.catalog.paths("wave_offsets")
            if v is not None and offp:
                # token-budget offsets (top_domain mode): ONE offset per
                # domain for the whole run (latest replaced table), shifting
                # the audit trail by the domain's semaphore-grant time
                off = self.spark.read.parquet(*offp)
                v = (
                    v.join(F.broadcast(off), ["domain"], "left")
                    .withColumn(
                        "virtual_ms",
                        F.col("virtual_ms") + F.coalesce(F.col("offset_ms"), F.lit(0)),
                    )
                    .drop("offset_ms")
                )
            return v
        if table == "visits":
            return self._wave_view("visits", ["domain", "url", "idx", "wave"], kind="visit")
        if table == "edges":
            v = self._wave_view("edges", ["domain", "url", "url2", "idx", "wave"], kind="edge")
            if v is None:
                return None
            return v.withColumnRenamed("url", "src").withColumnRenamed("url2", "dst")
        if table == "frontier":
            bucket_paths = self.catalog.frontier_bucket_paths()
            if not bucket_paths:
                return None
            df = self.spark.read.parquet(*bucket_paths.values())
            # the bucket partition column is re-derived (deterministic hash)
            return df.withColumn("bucket", self._bucket(F.col("domain")))
        paths = self.catalog.paths(table)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _wave_view(self, table: str, cols: list, kind: Optional[str] = None) -> Optional[DataFrame]:
        """row_kind-filtered view over the wave output log.

        wave_out is written partitionBy(row_kind) under wave=NNNNNN dirs,
        so with basePath at the table root BOTH wave and row_kind are
        Hive-style partition columns: the kind filter prunes whole
        directories at planning time — a 10^4-wave run's fetch_log query
        opens only fetch_log files, not every wave's every kind.  A
        compaction snapshot (compact_wave_out) folds prior waves into one
        row_kind-partitioned table that unions in here."""
        paths = self.catalog.paths("wave_out")
        cpaths = self.catalog.paths("wave_out_compacted")
        if not paths and not cpaths:
            return None
        kind = kind or table
        parts = []
        if paths:
            parts.append(
                self.spark.read.option(
                    "basePath", os.path.join(self.out_dir, "wave_out")
                ).parquet(*paths)
            )
        for p in cpaths:
            parts.append(self.spark.read.option("basePath", p).parquet(p))
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
        return df.filter(F.col("row_kind") == kind).select(*cols)

    def read_table(self, table: str) -> Optional[DataFrame]:
        return self._read(table)

    # -- run lifecycle -----------------------------------------------------

    def init_run(
        self,
        web_domains_df: DataFrame,
        specs_df: DataFrame,
        ip_facts_df: Optional[DataFrame] = None,
        cidr_df: Optional[DataFrame] = None,
    ) -> None:
        """Seed domain_state from crawl specs ⋈ per-domain web facts.

        Mirrors the domain-list scan + spec construction
        (ref: CrawlerMain.java:285-307,764-818); the blacklist/availability
        drops are plain joins the caller applies to specs_df first.

        IP/Geo admission (IpBlockList.java:61-93, GeoIpBlocklist.java:19-42)
        is applied here, at spec load, exactly like the reference: name
        rules (.cn TLD, 4+-digit runs) always; geo-graylist and CIDR rules
        when ``ip_facts_df`` (domain, ip, country) / ``cidr_df``
        (range_lo, range_hi — broadcast dimension) are provided.  Blocked
        domains are RECORDED with terminal phase 'blocked_ip' (never
        crawled, visible in domain_state) rather than silently dropped.
        """
        from ..operators.ipblocklist import domain_blocked_col

        wd = web_domains_df
        joined = specs_df.alias("s").join(wd.alias("w"), on="domain", how="left")
        top = F.coalesce(F.col("w.top_domain"), F.col("domain"))
        # sub_domain = hostname minus ".top_domain" ("" when they coincide)
        sub = F.when(F.col("domain") == top, F.lit("")).otherwise(
            F.col("domain").substr(F.lit(1), F.length(F.col("domain")) - F.length(top) - 1)
        )
        if ip_facts_df is not None:
            # deterministic single fact per domain (a multi-homed host with
            # several fact rows must not make admission partition-order
            # dependent): keep the lexicographic minimum
            ip_one = ip_facts_df.groupBy("domain").agg(
                F.min(F.struct(*[c for c in ip_facts_df.columns if c != "domain"])).alias("_f")
            )
            ip_one = ip_one.select(
                "domain",
                *[
                    F.col(f"_f.{c}").alias(c)
                    for c in ip_facts_df.columns
                    if c != "domain"
                ],
            )
            joined = joined.join(F.broadcast(ip_one), "domain", "left")
            country = F.col("country")
            ip_int = F.col("ip_int") if "ip_int" in ip_facts_df.columns else F.lit(None)
        else:
            country = F.lit(None).cast("string")
            ip_int = F.lit(None).cast("long")
        blocked = domain_blocked_col(F.col("domain"), sub, country)
        joined = joined.withColumn("_ip_blocked", blocked).withColumn("_ip_int", ip_int)
        if cidr_df is not None:
            # range-join against the broadcast CIDR dimension; the hit set
            # is tiny → broadcast it back as a flag
            cidr_hit = joined.select("domain", "_ip_int").join(
                F.broadcast(cidr_df),
                (F.col("_ip_int") >= F.col("range_lo"))
                & (F.col("_ip_int") <= F.col("range_hi")),
                "left_semi",
            )
            joined = joined.join(
                F.broadcast(
                    cidr_hit.select("domain").withColumn("_cidr_hit", F.lit(True))
                ),
                "domain",
                "left",
            ).withColumn(
                "_ip_blocked",
                F.col("_ip_blocked") | F.coalesce(F.col("_cidr_hit"), F.lit(False)),
            )
        ds = (
            joined.select(
                "domain",
                top.alias("top_domain"),
                F.to_json(
                    F.struct(
                        F.col("w.proto").alias("proto"),
                        F.col("w.probe").alias("probe"),
                        F.col("w.robots_txt").alias("robots_txt"),
                        F.col("w.site_kind").alias("site_kind"),
                        F.col("w.generator_meta").alias("generator_meta"),
                        F.col("w.has_lemmy_config").alias("has_lemmy_config"),
                        F.col("w.sitemap_urls").alias("sitemap_urls"),
                        F.col("s.crawl_depth").alias("crawl_depth"),
                        F.col("s.seed_urls").alias("seed_urls"),
                    )
                ).alias("info_json"),
                F.when(F.col("_ip_blocked"), F.lit("blocked_ip"))
                .otherwise(F.lit("pending"))
                .alias("phase"),
                F.lit(None).cast("string").alias("state_json"),
            )
            .dropDuplicates(["domain"])  # duplicate specs dedup (CrawlerMain:550-552)
        )
        # init starts a NEW run: forget any leftover snapshots (commit(0)
        # would otherwise merge with a previous run's latest manifest) and
        # pin this run's bucket layout for future resume engines
        self.catalog.reset()
        self.n_buckets, self.seed = self._ctor_n_buckets, self._ctor_seed
        self._write_engine_config()
        path = self.catalog.wave_path("domain_state", 0)
        ds.write.mode("overwrite").parquet(path)
        self.catalog.commit(0, {"domain_state": path})

    def run_waves(
        self,
        web_pages_df: DataFrame,
        wave_budget: Optional[int] = None,
        max_waves: int = 10_000,
        prev_crawl_df: Optional[DataFrame] = None,
        atags_df: Optional[DataFrame] = None,
        group_key: str = "domain",
        deadline_s: Optional[float] = None,
    ) -> int:
        """Advance all domains to terminal phase; returns wave count.

        ``deadline_s`` is the timed-run wall budget (the reference's
        TimedRun, default 7 days — CrawlerMain.java:831-878,410-433): once
        elapsed, no NEW wave is submitted; the in-flight wave commits its
        snapshot normally, so the run stays exactly resumable.

        ``group_key="top_domain"`` enforces the per-top-domain token
        budget PHYSICALLY (at most `permits` member domains advance per
        wave, mid-crawl members holding their slot — the reference's
        semaphore, LocalDomainCoordinator.java:22-122) and additionally
        models the 1 s grant cadence on the virtual clock via the offsets
        side table; per-domain order and seen-set are unchanged.  The wave
        still groups by domain, so a giant top-domain's runnable members
        stay spread across tasks.

        AQE partition coalescing is disabled for the wave jobs: it merges
        shuffle partitions by *byte size*, and the wave groups are tiny in
        bytes but heavy in compute (the per-domain crawl loop), so
        coalescing collapses the whole wave into one task and serializes
        the crawl.  Restored afterwards — for the scan/join/agg queries
        AQE coalescing is exactly right.
        """
        conf = self.spark.conf
        key = "spark.sql.adaptive.coalescePartitions.enabled"
        old_coalesce = conf.get(key, "true")
        conf.set(key, "false")
        try:
            return self._run_waves_inner(
                web_pages_df, wave_budget, max_waves, prev_crawl_df, atags_df,
                group_key, deadline_s,
            )
        finally:
            conf.set(key, old_coalesce)

    def _run_waves_inner(
        self,
        web_pages_df: DataFrame,
        wave_budget: Optional[int],
        max_waves: int,
        prev_crawl_df: Optional[DataFrame],
        atags_df: Optional[DataFrame] = None,
        group_key: str = "domain",
        deadline_s: Optional[float] = None,
    ) -> int:
        import time as _time

        waves_done = 0
        t_start = _time.monotonic()
        trace = os.environ.get("SPARK_GRAFT_WAVE_TIMING") == "1"
        _tp = [_time.monotonic()]

        def _mark(label: str) -> None:
            # opt-in per-phase wall trace (guide §1.5) — stderr only
            if trace:
                now = _time.monotonic()
                print(f"[wave-timing] {label}: {now - _tp[0]:.3f}s", file=sys.stderr)
                _tp[0] = now

        while waves_done < max_waves:
            if deadline_s is not None and _time.monotonic() - t_start >= deadline_s:
                break  # timed-run deadline: stop submitting waves, stay resumable
            manifest = self.catalog.load()
            wave = manifest["wave"] + 1

            domain_state = self._read("domain_state")
            active = domain_state.filter(F.col("phase").isin("pending", "active"))
            if group_key == "top_domain":
                # PHYSICAL permit enforcement (the reference's semaphore is
                # held for a domain's whole crawl —
                # LocalDomainCoordinator.java:22-122): at most `permits`
                # member domains of a top-domain run per wave.  Mid-crawl
                # members keep their slot (phase='active' outranks
                # 'pending'); freed slots go to pending members in
                # deterministic domain order (the lock-retry loop of
                # CrawlerMain.java:405-457, with domain order as the
                # determinism pin).  Held domains simply skip the wave —
                # their state rows are carried forward untouched.  The
                # offsets side table below stays as the 1 s-cadence
                # virtual-clock audit model of the same semaphore.
                from pyspark.sql import Window

                from ..operators.scheduling import permits_col

                slot_w = Window.partitionBy("top_domain").orderBy(
                    F.desc((F.col("phase") == "active").cast("int")),
                    F.col("domain"),
                )
                active = (
                    active.withColumn("_slot", F.row_number().over(slot_w))
                    .filter(F.col("_slot") <= permits_col(F.col("top_domain")))
                    .drop("_slot")
                )
            if self.conn_launches_per_wave is not None:
                # connection-launch throttle: only the first C pending
                # domains (deterministic domain order) may START this
                # wave; mid-crawl domains are unaffected.  Global
                # sort-limit compiles to TakeOrderedAndProject — a top-C
                # selection, not a single-partition shuffle of the state.
                launching = (
                    active.filter(F.col("phase") == "pending")
                    .orderBy("domain")
                    .limit(int(self.conn_launches_per_wave))
                )
                active = active.filter(F.col("phase") == "active").unionByName(
                    launching
                )
            if self.global_request_cap is not None:
                # global request semaphore: at most N domains in flight
                # per quantum; holders (phase='active') outrank waiters,
                # ties broken by domain — the same grant discipline as the
                # per-top-domain permits above.  Skipped domains carry
                # their state rows forward untouched and retry next wave.
                active = active.orderBy(
                    F.desc((F.col("phase") == "active").cast("int")),
                    F.col("domain"),
                ).limit(int(self.global_request_cap))
            # the runnable set is consumed by ~6 downstream plans this wave
            # (left build, frontier semi-join, pages semi-join, dirty
            # collect, carry anti-join) — cache it so each doesn't re-scan
            # the domain_state parquet
            active = active.persist()
            # ONE bounded action materializes the runnable set AND yields
            # the dirty-bucket list (≤ n_buckets rows): the former
            # separate isEmpty + post-wave collect were two extra jobs
            # per wave for the same information
            dirty = sorted(
                r["bucket"]
                for r in active.select(self._bucket(F.col("domain")).alias("bucket"))
                .distinct()
                .collect()
            )
            _mark("state read + runnable set build")
            if not dirty:  # no dirty buckets ⇔ no runnable domains
                active.unpersist()
                break

            left = active.select(
                "domain",
                F.lit("domain_state").alias("row_kind"),
                F.lit(0).cast("long").alias("url_hash"),
                F.lit(None).cast("string").alias("url"),
                F.lit(0).cast("long").alias("seq"),
                F.lit(None).cast("string").alias("state"),
                "state_json",
                "info_json",
                F.lit(0).cast("int").alias("http_status"),
                F.lit(None).cast("string").alias("image_id"),
                F.lit(None).cast("string").alias("etag"),
                F.lit(None).cast("string").alias("last_modified"),
                F.lit(0).cast("long").alias("lsh64"),
            )
            frontier = self._read("frontier")
            if frontier is not None:
                fr = frontier.join(active.select("domain"), "domain", "left_semi").select(
                    "domain",
                    F.lit("frontier").alias("row_kind"),
                    "url_hash",
                    "url",
                    "seq",
                    "state",
                    F.lit(None).cast("string").alias("state_json"),
                    F.lit(None).cast("string").alias("info_json"),
                    F.lit(0).cast("int").alias("http_status"),
                    F.lit(None).cast("string").alias("image_id"),
                    F.lit(None).cast("string").alias("etag"),
                    F.lit(None).cast("string").alias("last_modified"),
                    F.lit(0).cast("long").alias("lsh64"),
                )
                left = left.unionByName(fr)
            if prev_crawl_df is not None:
                pcd = prev_crawl_df
                # older prev-crawl tables may lack the validator columns
                if "last_modified" not in pcd.columns:
                    pcd = pcd.withColumn("last_modified", F.lit(None).cast("string"))
                if "lsh64" not in pcd.columns:
                    pcd = pcd.withColumn("lsh64", F.lit(None).cast("long"))
                pending = active.filter(F.col("phase") == "pending").select("domain")
                pc = pcd.join(pending, "domain", "left_semi").select(
                    "domain",
                    F.lit("prev_crawl").alias("row_kind"),
                    F.lit(0).cast("long").alias("url_hash"),
                    "url",
                    F.col("pos").cast("long").alias("seq"),
                    F.lit(None).cast("string").alias("state"),
                    F.lit(None).cast("string").alias("state_json"),
                    F.lit(None).cast("string").alias("info_json"),
                    F.col("http_status").cast("int").alias("http_status"),
                    "image_id",
                    "etag",
                    "last_modified",
                    F.coalesce(F.col("lsh64").cast("long"), F.lit(0)).alias("lsh64"),
                )
                left = left.unionByName(pc)
            if atags_df is not None:
                pending = active.filter(F.col("phase") == "pending").select("domain")
                at = atags_df.join(pending, "domain", "left_semi").select(
                    "domain",
                    F.lit("atag").alias("row_kind"),
                    F.lit(0).cast("long").alias("url_hash"),
                    "url",
                    F.col("pos").cast("long").alias("seq"),
                    F.lit(None).cast("string").alias("state"),
                    F.lit(None).cast("string").alias("state_json"),
                    F.lit(None).cast("string").alias("info_json"),
                    F.lit(0).cast("int").alias("http_status"),
                    F.lit(None).cast("string").alias("image_id"),
                    F.lit(None).cast("string").alias("etag"),
                    F.lit(None).cast("string").alias("last_modified"),
                    F.lit(0).cast("long").alias("lsh64"),
                )
                left = left.unionByName(at)

            # prune the pages side to ACTIVE domains before the cogroup:
            # terminal domains' pages would otherwise be shuffled every
            # wave for nothing — in late waves (1% of domains active) the
            # pruned shuffle is ~100× smaller.  The active list is tiny →
            # broadcast semi-join, no extra shuffle.
            pages_active = web_pages_df.join(
                F.broadcast(active.select("domain")), "domain", "left_semi"
            )
            # the wave ALWAYS groups by domain — budget mode bounds WHICH
            # domains run (slot claim above) but never merges them into a
            # top-domain mega-group, so giant top-domains stay spread
            # across tasks
            wave_fn = _make_wave_fn(
                wave_budget,
                self.seed,
                self.validate_inline,
                self.transport,
                self.body_cap_bytes,
            )
            out = (
                left.groupby("domain")
                .cogroup(pages_active.groupby("domain"))
                .applyInPandas(wave_fn, WAVE_OUT_SCHEMA)
            )

            # ONE physical write per wave: the unified output log,
            # partitioned by row_kind (the wave=NNNNNN dir name is the
            # outer partition).  The append tables (crawl_data/fetch_log/
            # visits) are row_kind-filtered views that prune whole
            # directories; frontier/domain_state replacements re-read only
            # their own kind's files (no recompute).
            opath = self.catalog.wave_path("wave_out", wave)
            _mark("wave plan build")
            out.write.partitionBy("row_kind").mode("overwrite").parquet(opath)
            _mark("cogroup crawl + wave_out write")
            table_paths: dict[str, Optional[str]] = {"wave_out": opath}
            out_w = self.spark.read.parquet(opath)


            # frontier: per-bucket COW (Iceberg partition-overwrite).  Only
            # buckets containing an active domain are rewritten; rows of
            # inactive domains that share a dirty bucket are carried over;
            # clean buckets keep their previous files via the manifest.
            new_frontier = (
                out_w.filter(F.col("row_kind") == "frontier")
                .select("domain", "url_hash", "url", "seq", "state")
                .withColumn("bucket", self._bucket(F.col("domain")))
            )
            if frontier is not None:
                # carry forward dirty-bucket rows of every domain that did
                # NOT emit replacement rows this wave — inactive domains
                # sharing the bucket, and faulted domains (the per-domain
                # error barrier emits only a domain_state row; dropping
                # their rows would erase the accumulated seen/REFUSED
                # lineage)
                replaced = new_frontier.select("domain").distinct()
                carry = frontier.filter(F.col("bucket").isin(dirty)).join(
                    F.broadcast(replaced), "domain", "left_anti"
                )
                new_frontier = carry.select(*new_frontier.columns).unionByName(
                    new_frontier
                )
            fpath = self.catalog.wave_path("frontier", wave)

            # domain_state: replace.  The carry side keeps terminal domains
            # AND permit-held members that skipped this wave (their rows
            # pass through untouched).
            new_ds = out_w.filter(F.col("row_kind") == "domain_state").select(
                "domain",
                F.col("state").alias("phase"),
                "state_json",
            ).join(domain_state.select("domain", "info_json", "top_domain"), "domain", "left")
            carried = domain_state.join(active.select("domain"), "domain", "left_anti")
            new_ds = new_ds.select(*carried.columns).unionByName(carried)
            dpath = self.catalog.wave_path("domain_state", wave)

            # the frontier and domain_state replacements are independent
            # once wave_out is on disk (both only read out_w + prior
            # tables and write DISJOINT paths), so submit them from two
            # threads: their per-job fixed costs (scheduling, shuffle
            # setup) overlap instead of serializing — this is the
            # dominant non-scaling cost of a wave at low core counts.
            # Nothing is committed until BOTH finish (catalog.commit
            # below), so a failure in either leaves the snapshot intact.
            from concurrent.futures import ThreadPoolExecutor

            def _write_frontier():
                new_frontier.repartition(
                    self.n_buckets, "bucket"
                ).write.partitionBy("bucket").mode("overwrite").parquet(fpath)

            def _write_domain_state():
                new_ds.write.mode("overwrite").parquet(dpath)

            with ThreadPoolExecutor(max_workers=2) as ex:
                futs = [ex.submit(_write_frontier), ex.submit(_write_domain_state)]
                for f in futs:
                    f.result()  # re-raises either failure before commit
            _mark("frontier + domain_state writes")

            frontier_buckets = {}
            for b in dirty:
                bdir = os.path.join(fpath, f"bucket={b}")
                frontier_buckets[b] = bdir if os.path.isdir(bdir) else None
            table_paths["domain_state"] = dpath

            if group_key == "top_domain":
                # Token-budget schedule, recomputed each wave from the
                # CUMULATIVE per-domain durations and REPLACED: one offset
                # per domain for the whole run — the reference's semaphore
                # is held for a domain's entire crawl, so per-wave
                # scheduling would both violate the permits invariant and
                # break per-domain clock monotonicity across waves.
                durs = (
                    self.spark.read.parquet(dpath)
                    .select(
                        "top_domain",
                        "domain",
                        F.coalesce(
                            F.get_json_object("state_json", "$.clock_ms").cast("long"),
                            F.lit(0),
                        ).alias("dur_ms"),
                    )
                    .filter(F.col("dur_ms") > 0)  # never-started domains hold no slot
                )
                offsets = durs.groupBy("top_domain").applyInPandas(
                    _make_offsets_fn(), OFFSETS_SCHEMA
                )
                offpath = self.catalog.wave_path("wave_offsets", wave)
                offsets.write.mode("overwrite").parquet(offpath)
                table_paths["wave_offsets"] = offpath

            self.catalog.commit(wave, table_paths, frontier_buckets=frontier_buckets)
            active.unpersist()
            waves_done += 1
            _mark("commit")
            # termination is detected by the NEXT iteration's runnable-set
            # materialization (one bounded action per wave) — a dedicated
            # post-wave none-active read-back would re-read domain_state a
            # second time every wave to save work only on the last one

        return waves_done

    # -- maintenance ------------------------------------------------------

    def compact_wave_out(self) -> Optional[str]:
        """Iceberg ``rewrite_data_files`` analogue for the wave output
        log: fold every committed per-wave dir (plus any previous
        compaction) into ONE row_kind-partitioned table with ``wave``
        carried as a data column, committed as a new snapshot that
        truncates the wave_out append list.  Views keep their row_kind
        pruning; resume and further waves continue normally; older
        snapshots still reference the original files (time travel intact)
        until ``expire_snapshots()`` reclaims them.  At 10^4 waves this
        bounds the views' file listing at O(kinds) instead of
        O(waves × kinds)."""
        manifest = self.catalog.load()
        paths = manifest["tables"].get("wave_out", [])
        if not paths:
            return None  # nothing new to fold
        parts = [
            self.spark.read.option(
                "basePath", os.path.join(self.out_dir, "wave_out")
            ).parquet(*paths)
        ]
        for p in manifest["tables"].get("wave_out_compacted", []):
            parts.append(self.spark.read.option("basePath", p).parquet(p))
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
        snap = manifest["wave"] + 1
        cpath = os.path.join(self.out_dir, "wave_out_compacted", f"v={snap:06d}")
        df.write.partitionBy("row_kind").mode("overwrite").parquet(cpath)
        self.catalog.commit(
            snap, {"wave_out_compacted": cpath}, truncate_append={"wave_out"}
        )
        return cpath

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Reclaim data files referenced only by expired snapshots (run
        after compaction).  Returns the removed paths."""
        return self.catalog.expire_snapshots(keep_last=keep_last)

    # -- result accessors ---------------------------------------------------

    def visits_in_order(self) -> DataFrame:
        v = self._read("visits")
        return v.orderBy("domain", "wave", "idx") if v is not None else None

    def lineage(self) -> list[dict]:
        """Per-partition lineage: every committed snapshot with its table
        paths and per-bucket frontier files (north rule: 'resumable from
        Iceberg snapshot checkpoints with per-partition lineage')."""
        out = []
        latest = self.catalog.latest_snapshot()
        if latest is None:
            return out
        for n in range(latest + 1):
            try:
                m = self.catalog.load(n)
            except FileNotFoundError:
                continue
            out.append(
                {
                    "snapshot": n,
                    "wave": m["wave"],
                    "tables": m["tables"],
                    "frontier_buckets": m.get("frontier_buckets", {}),
                }
            )
        return out

    def refused_reprobe_candidates(self, probe_fraction: float = 0.1) -> DataFrame:
        """The refused-re-probe input for the NEXT cycle: a deterministic
        hash-sampled fraction of this run's robots refusals ("to permit
        circumstances to change over time, we'll allow for a small chance
        of re-probing" — CrawlerWarcResynchronizer.java:70-78; seeded hash
        instead of Math.random, the repo-wide determinism pin).

        Refusal lineage comes from BOTH stores: frontier REFUSED rows
        (never-fetched refusals) and fetch_log REFUSED_ROBOTS actions
        (covers recrawl-time refusals of previously-visited URLs, whose
        frontier state stays VISITED to keep the seen-set exact).  The
        result is directly usable as the next cycle's ``atags_df``
        (domain, pos, url)."""
        from pyspark.sql import Window

        fr = self._read("frontier")
        log = self._read("fetch_log")
        parts = []
        if fr is not None:
            parts.append(
                fr.filter(
                    (F.col("state") == "REFUSED") & F.col("url").isNotNull()
                ).select("domain", "url")
            )
        if log is not None:
            parts.append(
                log.filter(F.col("action") == "REFUSED_ROBOTS").select("domain", "url")
            )
        if not parts:
            return self.spark.createDataFrame([], "domain string, pos long, url string")
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
        sampled = (
            cand.dropDuplicates(["url"])
            .filter(
                F.pmod(F.xxhash64("url", F.lit(self.seed)), F.lit(1000))
                < int(probe_fraction * 1000)
            )
        )
        w = Window.partitionBy("domain").orderBy("url")
        return sampled.withColumn("pos", F.row_number().over(w).cast("long")).select(
            "domain", "pos", "url"
        )

    def dedup_metrics(self) -> Optional[DataFrame]:
        """Fetch/dedup metrics per domain: URLs seen (KNOWN+REFUSED+VISITED),
        visited, still queued, robots refusals, fetch attempts."""
        fr = self._read("frontier")
        if fr is None:
            return None
        agg = fr.groupBy("domain").agg(
            F.sum(F.when(F.col("state") == "VISITED", 1).otherwise(0)).alias("n_visited"),
            F.sum(
                F.when(F.col("state").isin("KNOWN", "REFUSED"), 1).otherwise(0)
            ).alias("n_known_unvisited"),
            F.sum(F.when(F.col("state") == "REFUSED", 1).otherwise(0)).alias("n_refused"),
            F.sum(F.when(F.col("state") == "QUEUED", 1).otherwise(0)).alias("n_queued"),
        )
        log = self._read("fetch_log")
        if log is not None:
            acts = log.groupBy("domain").agg(
                F.sum(F.when(F.col("action") == "REFUSED_ROBOTS", 1).otherwise(0)).alias(
                    "n_robots_refused"
                ),
                F.sum(F.when(F.col("action").startswith("FETCH"), 1).otherwise(0)).alias(
                    "n_fetch_attempts"
                ),
            )
            agg = agg.join(acts, "domain", "left")
        return agg

    def crawl_meta(self) -> DataFrame:
        """Per-domain crawl metrics (§2.5/§2.11 analogue of DomainStateDb
        CrawlMeta), computed relationally from the state + output tables."""
        ds = self._read("domain_state")
        meta = ds.select(
            "domain",
            "phase",
            F.get_json_object("state_json", "$.visited_cnt").cast("long").alias("visited_cnt"),
            F.get_json_object("state_json", "$.error_count").cast("long").alias("error_count"),
            F.get_json_object("state_json", "$.crawler_additions")
            .cast("long")
            .alias("crawl_changes"),
            F.get_json_object("state_json", "$.recrawl_size").cast("long").alias("recrawl_size"),
            F.get_json_object("state_json", "$.recrawl_recrawled")
            .cast("long")
            .alias("recrawl_recrawled"),
            F.get_json_object("state_json", "$.recrawl_retained")
            .cast("long")
            .alias("recrawl_retained"),
            F.get_json_object("state_json", "$.recrawl_skipped")
            .cast("long")
            .alias("recrawl_skipped"),
            F.get_json_object("state_json", "$.clock_ms").cast("long").alias("crawl_time_ms"),
            F.get_json_object("state_json", "$.feed_url").alias("feed_url"),
            F.get_json_object("state_json", "$.favicon_url").alias("favicon_url"),
            F.get_json_object("state_json", "$.favicon_content_type").alias(
                "favicon_content_type"
            ),
        )
        cd = self._read("crawl_data")
        if cd is not None:
            good = (
                cd.filter(F.col("http_status").isin(200, 206))
                .groupBy("domain")
                .agg(F.count("*").alias("good_status_count"))
            )
            meta = meta.join(good, "domain", "left")
        return meta

    def crawl_meta_with_budget(self) -> DataFrame:
        """crawl_meta extended with the per-top-domain politeness-budget
        wall-clock model (permits + makespan; scheduling.py §2.9)."""
        from ..operators.scheduling import top_domain_makespan

        ds = self._read("domain_state").select("domain", "top_domain")
        meta = self.crawl_meta().join(ds, "domain", "left")
        budget = top_domain_makespan(
            meta.select("domain", "top_domain", F.coalesce("crawl_time_ms", F.lit(0)).alias("crawl_time_ms"))
        )
        return meta.join(budget, "top_domain", "left")
