"""Snapshot checkpointing — Iceberg-style manifests over parquet.

The north rule requires runs "resumable from Iceberg snapshot checkpoints
with per-partition lineage".  Iceberg jars are not in this sandbox image,
so the same mechanics are provided over plain parquet:

- every wave commits a numbered snapshot manifest (JSON) listing, per
  table, the live data paths (append tables accumulate paths, replace
  tables point at the latest version);
- resume = load the last committed manifest and continue from its wave;
- a killed run leaves at most an uncommitted wave directory behind, which
  the next run ignores (atomic commit = manifest write + rename).

In production this maps 1:1 onto Iceberg: appends → AppendFiles, replaces
→ partition-overwrite/MERGE, the manifest → the snapshot metadata, and
``version_of``/``rollback`` → time travel.  The analogue of the
reference's WorkLog+WARC-resync resume (ref: code/processes/
crawling-process/java/nu/marginalia/crawl/CrawlerMain.java:652-673,
CrawlerWarcResynchronizer.java:31-103) comes for free: the frontier and
crawl tables at the last snapshot *are* the resync state.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

APPEND_TABLES = ("wave_out",)  # unified append log; crawl_data/fetch_log/
# visits are row_kind-filtered views over it (one physical write per wave)
REPLACE_TABLES = ("domain_state", "wave_offsets", "wave_out_compacted")
# wave_out_compacted: the rewrite_data_files analogue — a compaction
# snapshot folds all committed wave_out dirs into one row_kind-partitioned
# table (wave carried as a data column) and truncates the wave_out append
# list; older snapshots keep referencing the original files (time travel
# intact) until expire_snapshots reclaims them
# wave_offsets is REPLACED: the token-budget schedule is recomputed each
# wave from cumulative per-domain durations (one offset per domain for
# the whole run — the reference's semaphore is held for a domain's entire
# crawl), so only the latest table is live
# the frontier is tracked per bucket (manifest key "frontier_buckets") —
# Iceberg partition-overwrite semantics: a wave only rewrites dirty buckets


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- manifest management -------------------------------------------

    def _snap_path(self, n: int) -> str:
        return os.path.join(self.snap_dir, f"snap-{n:06d}.json")

    def reset(self) -> None:
        """Forget all committed snapshots (init_run starts a NEW run).
        Without this, commit(0) would merge with a leftover run's latest
        manifest — snapshot 0 claiming old waves' data as live."""
        for f in os.listdir(self.snap_dir):
            if f.startswith("snap-") and f.endswith(".json"):
                os.remove(os.path.join(self.snap_dir, f))

    def _snapshots(self) -> list[int]:
        return sorted(
            int(f[5:11])
            for f in os.listdir(self.snap_dir)
            if f.startswith("snap-") and f.endswith(".json")
        )

    def latest_snapshot(self) -> Optional[int]:
        snaps = self._snapshots()
        return snaps[-1] if snaps else None

    def load(self, n: Optional[int] = None) -> dict:
        if n is None:
            n = self.latest_snapshot()
        if n is None:
            return {"wave": -1, "tables": {t: [] for t in APPEND_TABLES + REPLACE_TABLES}}
        with open(self._snap_path(n)) as f:
            return json.load(f)

    def commit(
        self,
        wave: int,
        table_paths: dict[str, Optional[str]],
        frontier_buckets: Optional[dict[int, str]] = None,
        truncate_append: Optional[set] = None,
    ) -> dict:
        """Commit wave N: append-table paths accumulate, replace-table paths
        supersede.  ``frontier_buckets`` maps *dirty* bucket ids to their new
        per-bucket data path (Iceberg partition-overwrite semantics: clean
        buckets keep pointing at their previous files).
        ``truncate_append`` names append tables whose accumulated path list
        restarts at this snapshot (compaction folded them elsewhere).
        Atomic via write-to-temp + rename."""
        prev = self.load()
        manifest = {"wave": wave, "tables": {}}
        for t in APPEND_TABLES:
            if truncate_append and t in truncate_append:
                paths = []
            else:
                paths = list(prev["tables"].get(t, []))
            if table_paths.get(t):
                paths.append(table_paths[t])
            manifest["tables"][t] = paths
        for t in REPLACE_TABLES:
            if table_paths.get(t):
                manifest["tables"][t] = [table_paths[t]]
            else:
                manifest["tables"][t] = list(prev["tables"].get(t, []))
        buckets = dict(prev.get("frontier_buckets", {}))
        if frontier_buckets:
            for b, p in frontier_buckets.items():
                if p is None:  # dirty bucket emptied out this wave
                    buckets.pop(str(b), None)
                else:
                    buckets[str(b)] = p
        manifest["frontier_buckets"] = buckets
        tmp = self._snap_path(wave) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._snap_path(wave))
        return manifest

    def frontier_bucket_paths(self, snapshot: Optional[int] = None) -> dict[str, str]:
        return self.load(snapshot).get("frontier_buckets", {})

    # -- table IO helpers -------------------------------------------------

    def wave_path(self, table: str, wave: int) -> str:
        return os.path.join(self.root, table, f"wave={wave:06d}")

    def paths(self, table: str, snapshot: Optional[int] = None) -> list[str]:
        return self.load(snapshot)["tables"].get(table, [])

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Iceberg expire_snapshots analogue: drop all but the newest
        ``keep_last`` manifests and delete data dirs referenced ONLY by
        expired ones.  Run after a compaction to reclaim the folded
        per-wave files; time travel to expired snapshots is gone (by
        design — exactly Iceberg's contract)."""
        snaps = self._snapshots()
        if len(snaps) <= keep_last:
            return []
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live: set[str] = set()
        for n in keep:
            m = self.load(n)
            for ps in m["tables"].values():
                live.update(ps)
            live.update(m.get("frontier_buckets", {}).values())
        removed: list[str] = []
        for n in drop:
            m = self.load(n)
            doomed = [p for ps in m["tables"].values() for p in ps] + list(
                m.get("frontier_buckets", {}).values()
            )
            for path in doomed:
                if path in live or not os.path.exists(path):
                    continue
                # keep dirs that contain (or live inside) a live path;
                # compare whole path components (seen-1 is not a prefix
                # of seen-10) by appending the separator before testing
                psep = path.rstrip(os.sep) + os.sep
                if any(
                    (l.rstrip(os.sep) + os.sep).startswith(psep)
                    or psep.startswith(l.rstrip(os.sep) + os.sep)
                    for l in live
                ):
                    continue
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
            os.remove(self._snap_path(n))
        return removed

    def rollback_to(self, n: int) -> None:
        """Delete manifests (and orphaned data dirs) newer than snapshot n."""
        latest = self.latest_snapshot()
        if latest is None:
            return
        keep = self.load(n)
        live: set[str] = set()
        for t, ps in keep["tables"].items():
            live.update(ps)
        live.update(keep.get("frontier_buckets", {}).values())
        for m in range(n + 1, latest + 1):
            p = self._snap_path(m)
            if os.path.exists(p):
                doomed = self.load(m)
                doomed_paths = [
                    path for ps in doomed["tables"].values() for path in ps
                ] + list(doomed.get("frontier_buckets", {}).values())
                for path in doomed_paths:
                    if path not in live and os.path.exists(path):
                        # skip bucket dirs whose parent wave is still live
                        if any(l.startswith(path) or path.startswith(l) for l in live):
                            continue
                        shutil.rmtree(path, ignore_errors=True)
                os.remove(p)
