"""Inline payload validation through the engine: crawl_data carries the
decoded-image phash + PSNR verdict, and the phash matches the corpus
generator's stored (decoded-image) phash for every fetched image."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.plans.crawl import SparkCrawlEngine
from marginaliasearch_spark.sources.corpus import corpus_row
from marginaliasearch_spark.sources.synthetic_web import (
    generate_web,
    spark_schemas,
    web_to_frames,
)


def test_validate_inline_columns(spark, tmp_path):
    web, _ = generate_web(seed=42, n_domains=6, mean_pages=8)
    pages_pdf, domains_pdf = web_to_frames(web)
    ps, ds = spark_schemas()
    pages = spark.createDataFrame(pages_pdf, schema=ps)
    domains = spark.createDataFrame(domains_pdf, schema=ds)
    specs = domains.select("domain", "crawl_depth", "seed_urls")

    engine = SparkCrawlEngine(
        spark, str(tmp_path / "vi"), seed=42, n_buckets=4, validate_inline=True
    )
    engine.init_run(domains, specs)
    engine.run_waves(pages, wave_budget=None)

    cd = engine.read_table("crawl_data").filter(F.col("image_id").isNotNull())
    rows = cd.select("image_id", "phash", "psnr_ok").collect()
    assert rows
    assert all(r["psnr_ok"] == 1 for r in rows)  # PSNR ≥ 40 dB invariant holds
    for r in rows[:10]:
        idx = int(r["image_id"].split("-")[1])
        assert r["phash"] == int(corpus_row(42, idx)["phash"]), r["image_id"]

    # without the flag the columns stay null
    e2 = SparkCrawlEngine(spark, str(tmp_path / "novi"), seed=42, n_buckets=4)
    e2.init_run(domains, specs)
    e2.run_waves(pages, wave_budget=None)
    cd2 = e2.read_table("crawl_data")
    assert cd2.filter(F.col("phash").isNotNull()).count() == 0


def test_validate_image_ids_stage(spark):
    """The row-balanced post-hoc validation stage (round 5 — the scale
    topology) must agree with the inline path's verdicts: every corpus
    image decodes, lossy rows clear the PSNR floor, and the codec column
    reflects the real backend per fmt."""
    from pyspark.sql import functions as F

    from marginaliasearch_spark.plans.validate import validate_image_ids

    df = spark.createDataFrame(
        [(f"img-{i:010d}",) for i in range(30)] + [(None,)],
        "image_id string",
    )
    v = validate_image_ids(df, seed=42).toPandas()
    assert len(v) == 30  # NULL image_id ignored
    assert v["decode_ok"].all()
    assert v["psnr_ok"].all()
    by_codec = v.set_index("image_id")["codec"].to_dict()
    for image_id, codec in by_codec.items():
        idx = int(image_id.split("-")[1])
        assert codec == ("png", "jpeg", "stub")[idx % 3], image_id
    # lossy rows show real (finite) PSNR, lossless rows are exact
    lossy = v[v["fmt"].isin(["jpeg", "webp"])]
    assert (lossy["psnr_db"] >= 40.0).all()
    assert (lossy["psnr_db"] < 900.0).all()  # finite -> genuinely lossy
