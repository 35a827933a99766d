"""EasyLSH content fingerprint: bit-exactness against golden vectors
generated from the COMPILED reference (EasyLSH.java + CrawlDataReference
contentHash), plus the near-dup/different behavioral contract."""

from marginaliasearch_spark.canon.easylsh import (
    content_hash,
    content_hash_signed,
    hamming,
    is_content_body_same,
)


def test_golden_vectors_from_compiled_reference():
    n = 0
    for line in open("tests/golden/easylsh.tsv"):
        want, text = line.rstrip("\n").split("\t", 1)
        assert content_hash(text) == int(want), text[:40]
        n += 1
    assert n >= 10


def test_same_near_and_different():
    a = "The quick brown fox jumps over the lazy dog. " * 20
    near = a.replace("lazy dog", "lazy cat", 1)
    diff = "entirely different text about submarines " * 20
    assert is_content_body_same(a, a)
    assert is_content_body_same(a, near)
    assert not is_content_body_same(a, diff)
    assert hamming(content_hash(a), content_hash(a)) == 0


def test_signed_form_reserves_zero():
    # '<tag only, never closed' hashes to 0 (golden file); the storage
    # form remaps it to 1 because 0 is the 'absent' sentinel
    assert content_hash("<tag only, never closed") == 0
    assert content_hash_signed("<tag only, never closed") == 1
    # and the remap stays inside the same-document hamming band
    assert hamming(1, 0) < 4
