"""Dry-run verification of the SnapshotCatalog ⇄ Iceberg mapping
(plans/iceberg.py): a recording stub with the DataFrameWriterV2 surface
pins the EXACT call sequence each checkpoint operation translates to.
When the Iceberg runtime is actually on the classpath (cluster deploys),
the same adapter runs unchanged — `available(spark)` feature-flags it."""

import pytest

from marginaliasearch_spark.plans.iceberg import IcebergCheckpointAdapter


class _Recorder:
    def __init__(self):
        self.calls = []

    def sql(self, q):
        self.calls.append(("sql", " ".join(q.split())))
        return self

    # spark.sql() result surface (unused by assertions)
    def collect(self):
        return []


class _FakeWriterV2:
    def __init__(self, rec, table):
        self.rec, self.table = rec, table

    def append(self):
        self.rec.calls.append(("append", self.table))

    def createOrReplace(self):
        self.rec.calls.append(("createOrReplace", self.table))

    def overwrite(self, cond):
        self.rec.calls.append(("overwrite", self.table, str(cond)))


class _FakeDF:
    def __init__(self, rec):
        self.rec = rec

    def writeTo(self, table):
        return _FakeWriterV2(self.rec, table)


@pytest.fixture
def rig():
    rec = _Recorder()
    adapter = IcebergCheckpointAdapter(rec, catalog="msx", namespace="crawl")
    assert rec.calls[0] == ("sql", "CREATE NAMESPACE IF NOT EXISTS msx.crawl")
    rec.calls.clear()
    return rec, adapter


def test_commit_wave_sequence(rig, spark):
    """commit(): append table → AppendFiles; replace tables →
    createOrReplace; dirty frontier buckets → OverwriteByRowFilter on the
    bucket column; then one wave tag per committed table."""
    rec, a = rig
    a.commit_wave(
        7,
        wave_out_df=_FakeDF(rec),
        replace_dfs={"domain_state": _FakeDF(rec), "wave_offsets": _FakeDF(rec)},
        frontier_df=_FakeDF(rec),
        dirty_buckets=[3, 11],
    )
    kinds = [c[0] for c in rec.calls]
    assert kinds == ["append", "createOrReplace", "createOrReplace",
                     "overwrite", "sql", "sql", "sql", "sql"]
    assert rec.calls[0][1] == "msx.crawl.wave_out"
    assert rec.calls[3][1] == "msx.crawl.frontier"
    assert "bucket" in rec.calls[3][2] and "3" in rec.calls[3][2]
    tags = [c[1] for c in rec.calls if c[0] == "sql"]
    assert all("CREATE OR REPLACE TAG `wave_000007`" in t for t in tags)
    assert {t.split(" ")[2] for t in tags} == {
        "msx.crawl.wave_out", "msx.crawl.domain_state",
        "msx.crawl.wave_offsets", "msx.crawl.frontier",
    }


def test_time_travel_and_resume(rig):
    rec, a = rig
    a.read_at("wave_out", 3)
    a.latest_wave()
    assert rec.calls[0] == (
        "sql", "SELECT * FROM msx.crawl.wave_out VERSION AS OF 'wave_000003'"
    )
    assert "refs" in rec.calls[1][1] and "wave\\_%" in rec.calls[1][1]


def test_maintenance_procedures(rig):
    rec, a = rig
    a.compact()
    a.expire_snapshots("wave_out", keep_last=2)
    a.rollback_to("frontier", 5)
    assert rec.calls == [
        ("sql", "CALL msx.system.rewrite_data_files(table => 'crawl.wave_out')"),
        ("sql", "CALL msx.system.expire_snapshots(table => 'crawl.wave_out', retain_last => 2)"),
        ("sql", "CALL msx.system.set_current_snapshot(table => 'crawl.frontier', ref => 'wave_000005')"),
    ]


def test_feature_flag_off_in_this_image(spark):
    """This sandbox has no Iceberg runtime — the flag must say so (and on
    a cluster with the jars it flips on with no code change)."""
    assert IcebergCheckpointAdapter.available(spark) is False
