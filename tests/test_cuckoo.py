"""Batch-67 cuckoo-filter invariants: no false negatives ever (incl. past
the kick limit via the orphan stash), delete really deletes, the XOR
partner rule is involutive, the cuckoo-fronted SeenShard reproduces the
bloom-fronted shard's exact seen-set, and checkpoints round-trip."""

import hashlib
import os

import numpy as np
import pytest

from omni_ray.state.filters import BloomFilter, CuckooFilter


def _digests(n, seed=0):
    return [hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range(n)]


def test_membership_and_involution():
    cf = CuckooFilter(n_buckets=1 << 10)
    ds = _digests(2000)
    for d in ds:
        cf.add(d)
    # exactness contract: everything added answers True (no false negatives)
    assert all(cf.might_contain(d) for d in ds)
    # alt(alt(i)) == i for every key
    for d in ds[:200]:
        fp, i1 = cf._fp_i1(d)
        i2 = cf._alt(i1, fp)
        assert cf._alt(i2, fp) == i1
    # unseen false-positive rate bounded (16-bit fp, 2 buckets x 4 slots)
    probe = _digests(2000, seed=1)
    fpp = sum(cf.might_contain(d) for d in probe) / len(probe)
    assert fpp < 0.05


def test_overfill_stash_keeps_exactness():
    cf = CuckooFilter(n_buckets=1 << 4)  # capacity 64 slots
    ds = _digests(120)  # ~190% load: forces kick-limit overflows
    for d in ds:
        cf.add(d)
    assert all(cf.might_contain(d) for d in ds)
    assert len(cf.stash) > 0  # overflow really exercised
    assert cf.n_items == len(ds)


def test_delete():
    cf = CuckooFilter(n_buckets=1 << 10)
    ds = _digests(500)
    for d in ds:
        cf.add(d)
    for d in ds[:250]:
        assert cf.delete(d)
    # deleted halves may only survive as fp collisions with the kept half;
    # with 16-bit fingerprints that tail is tiny
    ghosts = sum(cf.might_contain(d) for d in ds[:250])
    assert ghosts <= 5
    assert all(cf.might_contain(d) for d in ds[250:])
    assert not cf.delete(hashlib.md5(b"never-added").digest())


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_front_seen_set_equality(tmp_path):
    """The front tier must not change the shard's answers: replaying the
    same two waves of url hashes through a bloom-fronted and a
    cuckoo-fronted SeenSet yields identical seen flags and final sizes,
    and the cuckoo checkpoint restores to the same answers."""
    from omni_ray.state.filters import SeenSet

    hashes = [hashlib.md5(f"u{i}".encode()).hexdigest() for i in range(3000)]
    wave1, wave2 = hashes[:2000], hashes[1000:]  # 1000 overlap

    bloom = SeenSet(n_shards=4, front="bloom")
    cuckoo = SeenSet(n_shards=4, front="cuckoo")
    try:
        for ss in (bloom, cuckoo):
            assert ss.check_and_add_hashes(wave1) == [False] * len(wave1)
        f_b = bloom.check_and_add_hashes(wave2)
        f_c = cuckoo.check_and_add_hashes(wave2)
        assert f_b == f_c == [True] * 1000 + [False] * 1000
        assert bloom.total_size() == cuckoo.total_size() == 3000

        ck = str(tmp_path / "cuckoo_ck")
        cuckoo.checkpoint(ck)
        fresh = SeenSet(n_shards=4, front="cuckoo")
        try:
            assert fresh.restore(ck) == 3000
            again = fresh.check_and_add_hashes(hashes)
            assert again == [True] * len(hashes)
        finally:
            fresh.shutdown()
    finally:
        bloom.shutdown()
        cuckoo.shutdown()


def test_bloom_front_unchanged():
    """Guard: the default bloom path still behaves (no regression from the
    front refactor)."""
    bf = BloomFilter(n_bits=1 << 16)
    ds = _digests(1000)
    for d in ds:
        bf.add(d)
    assert all(bf.might_contain(d) for d in ds)
