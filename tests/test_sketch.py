"""Unit + property tests for the membership sketches (Bloom / cuckoo)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.sketch import BloomFilter, CuckooFilter

H = st.integers(min_value=0, max_value=(1 << 60) - 1)


@given(st.lists(H, min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(keys):
    f = BloomFilter(1 << 12, 5)
    f.add(np.array(keys, dtype=np.int64))
    assert f.maybe_contains(np.array(keys, dtype=np.int64)).all()


def test_bloom_false_positive_rate_reasonable():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 1 << 60, size=2000, dtype=np.int64)
    absent = rng.integers(0, 1 << 60, size=2000, dtype=np.int64)
    f = BloomFilter(1 << 16, 5)
    f.add(present)
    fp = f.maybe_contains(absent).mean()
    assert fp < 0.05  # 64 Kib / 2 k items, k=5 -> ~1e-3 expected


@given(st.lists(H, min_size=1, max_size=100, unique=True), st.lists(H, min_size=1, max_size=100, unique=True))
@settings(max_examples=25, deadline=None)
def test_bloom_merge_associative_union(a, b):
    fa = BloomFilter(1 << 12, 5)
    fa.add(np.array(a, dtype=np.int64))
    fb = BloomFilter(1 << 12, 5)
    fb.add(np.array(b, dtype=np.int64))
    merged = fa.merge(fb)
    both = np.array(a + b, dtype=np.int64)
    assert merged.maybe_contains(both).all()
    # merge == build-at-once
    fc = BloomFilter(1 << 12, 5)
    fc.add(both)
    assert (merged.bits == fc.bits).all()


def test_bloom_serialization_roundtrip():
    f = BloomFilter(1 << 12, 5)
    f.add(np.array([1, 2, 3], dtype=np.int64))
    g = BloomFilter.from_bytes(f.to_bytes(), 5)
    assert g.maybe_contains(np.array([1, 2, 3], dtype=np.int64)).all()


@given(st.lists(H, min_size=1, max_size=300, unique=True))
@settings(max_examples=30, deadline=None)
def test_cuckoo_membership_and_delete(keys):
    f = CuckooFilter(1 << 10)
    inserted = [h for h in keys if f.add(h)]
    assert f.maybe_contains(np.array(inserted, dtype=np.int64)).all()
    # delete half, the rest must still be present (no false negatives)
    for h in inserted[::2]:
        assert f.delete(h)
    rest = inserted[1::2]
    if rest:
        assert f.maybe_contains(np.array(rest, dtype=np.int64)).all()


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(1 << 8)
    keys = list(range(1000, 1050))
    for k in keys:
        f.add(k)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.maybe_contains(np.array(keys, dtype=np.int64)).all()
    assert g.delete(keys[0])


def test_cuckoo_low_false_positive():
    rng = np.random.default_rng(11)
    present = [int(x) for x in rng.integers(0, 1 << 60, size=1000)]
    absent = rng.integers(0, 1 << 60, size=2000, dtype=np.int64)
    f = CuckooFilter(1 << 10)
    for h in present:
        assert f.add(h)
    assert f.maybe_contains(absent).mean() < 0.05


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_empty_probe(kind):
    f = BloomFilter() if kind == "bloom" else CuckooFilter()
    assert f.maybe_contains(np.array([], dtype=np.int64)).shape == (0,)
