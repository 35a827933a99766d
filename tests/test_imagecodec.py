"""Image codec + phash + corpus invariants (input_hint contract)."""

import numpy as np
import pytest

from marginaliasearch_spark.functions.imagecodec import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)
from marginaliasearch_spark.sources.corpus import generate_corpus, make_caption, make_image


def test_lossless_roundtrip():
    arr, _ = make_image(42, 0)
    data = encode_image(arr, "png")
    out, fmt = decode_image(data)
    assert fmt == "png"
    np.testing.assert_array_equal(arr, out)
    assert psnr(arr, out) == float("inf")


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_invariant(fmt):
    for i in range(5):
        arr, _ = make_image(42, i)
        out, _ = decode_image(encode_image(arr, fmt))
        assert psnr(arr, out) >= 40.0  # the input_hint invariant


def test_decode_garbage_raises():
    with pytest.raises(ValueError):
        decode_image(b"not an image")
    with pytest.raises(ValueError):
        decode_image(b"")


def test_phash_properties():
    a, _ = make_image(42, 1)
    b, _ = make_image(42, 2)
    ha, hb = phash64(a), phash64(b)
    assert ha != hb  # different images differ
    assert hamming64(ha, ha) == 0
    # lossy re-encode keeps the perceptual hash close (the 'unchanged' check)
    lossy, _ = decode_image(encode_image(a, "jpeg"))
    assert hamming64(ha, phash64(lossy)) < 4


def test_distributed_corpus_row_for_row_equal(spark):
    """distributed_corpus (executor-side generation) equals the driver's
    generate_corpus+createDataFrame table byte-for-byte per image_id."""
    from marginaliasearch_spark.sources.corpus import distributed_corpus

    old = {
        r["image_id"]: (bytes(r["bytes"]), r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
        for _, r in generate_corpus(42, 16).iterrows()
    }
    new = {
        r["image_id"]: (bytes(r["bytes"]), r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
        for r in distributed_corpus(spark, 42, 16).collect()
    }
    assert old == new


def test_corpus_deterministic_and_typed():
    c1 = generate_corpus(42, 20)
    c2 = generate_corpus(42, 20)
    assert c1["phash"].tolist() == c2["phash"].tolist()
    assert c1["caption"].tolist() == c2["caption"].tolist()
    assert (c1["bytes"] == c2["bytes"]).all()
    assert str(c1["w"].dtype) == "int32"
    assert str(c1["phash"].dtype) == "int64"
    assert set(c1["fmt"]) <= {"png", "jpeg", "webp"}
    # stored phash matches decoded pixels
    for _, row in c1.head(5).iterrows():
        arr, _ = decode_image(row["bytes"])
        assert phash64(arr) == row["phash"]
    # caption generator matches row captions
    for i, cap in enumerate(c1["caption"].head(5)):
        assert cap == make_caption(42, i)
