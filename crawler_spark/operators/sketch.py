"""Membership sketches for the URL-seen set (north_rule: sharded Bloom
filter with cuckoo fallback for deletes).

Pure numpy — no Spark imports — so the structures are unit-testable and
serializable into the `seen_sketch` table (bits:binary). Both filters key
on the 60-bit md5 url_hash (kernels.url_hash64); derived probe positions
use Kirsch-Mitzenmacher double hashing h_i = h1 + i*h2 so NO additional
md5 work is needed per probe.

Role in the engine (SURVEY §2.3 J2/J3): the sketches are ACCELERATORS in
front of the exact anti-join — a candidate whose sketch probe says
"definitely new" skips the exact check; "maybe seen" candidates fall
through to the anti-join against the seen table. Correctness NEVER
depends on the sketch (false positives only cost an extra join row;
false negatives cannot happen for inserted keys).
"""

from __future__ import annotations

import numpy as np

_MASK60 = (1 << 60) - 1


def _h2(h1: np.ndarray) -> np.ndarray:
    """Second hash derived from the first (odd multiplier, splitmix-ish)
    — avoids a second md5 pass over the URL."""
    x = (h1.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(2**64 - 1)
    x ^= x >> np.uint64(29)
    return (x & np.uint64(_MASK60)).astype(np.int64)


class BloomFilter:
    """Standard k-hash Bloom over a bit array; associative merge (OR)."""

    KIND = "bloom"

    def __init__(self, n_bits: int = 1 << 16, k: int = 5, bits: np.ndarray | None = None):
        assert n_bits % 8 == 0
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)
        self.n_items = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = np.asarray(hashes, dtype=np.int64)
        h2 = _h2(h1)
        idx = np.arange(self.k, dtype=np.int64)[:, None]
        return ((h1[None, :] + idx * h2[None, :]) % self.n_bits).astype(np.int64)

    def add(self, hashes) -> None:
        pos = self._positions(np.atleast_1d(np.asarray(hashes, dtype=np.int64))).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        self.n_items += np.atleast_1d(hashes).shape[0]

    def maybe_contains(self, hashes) -> np.ndarray:
        arr = np.atleast_1d(np.asarray(hashes, dtype=np.int64))
        if arr.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(arr)
        hit = (self.bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        out = BloomFilter(self.n_bits, self.k, np.bitwise_or(self.bits, other.bits))
        out.n_items = self.n_items + other.n_items
        return out

    def fold_to(self, n_bits: int) -> "BloomFilter":
        """Downsize a power-of-two filter to a smaller power of two by
        OR-folding halves. Correct (no false negatives) because probe
        positions are `h % n_bits` and `(p mod 2^a) mod 2^b == p mod 2^b`
        when b <= a — the folded filter answers exactly as if it had been
        built at the smaller size. FP rate rises accordingly; callers
        prefer rebuild-at-proper-size and use folding only to make
        unequal-size merges safe."""
        assert n_bits <= self.n_bits and self.n_bits % n_bits == 0
        assert (n_bits & (n_bits - 1)) == 0 and n_bits % 8 == 0
        if n_bits == self.n_bits:
            return self
        folded = np.bitwise_or.reduce(self.bits.reshape(-1, n_bits // 8), axis=0)
        out = BloomFilter(n_bits, self.k, folded)
        out.n_items = self.n_items
        return out

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int = 5) -> "BloomFilter":
        bits = np.frombuffer(data, dtype=np.uint8).copy()
        return cls(n_bits=len(bits) * 8, k=k, bits=bits)


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNEXT'14): 4-slot buckets of 16-bit
    fingerprints; supports DELETE, which Bloom cannot — used for seen-set
    shards that see cascade deletes (SURVEY §2.1 S13/S14)."""

    KIND = "cuckoo"
    SLOTS = 4
    MAX_KICKS = 250

    def __init__(self, n_buckets: int = 1 << 12, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "power of two"
        self.n_buckets = n_buckets
        self.table = (
            table if table is not None else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )
        self.n_items = 0

    def _fp(self, h: int) -> int:
        fp = (h >> 44) & 0xFFFF
        return fp if fp != 0 else 1  # 0 marks empty slot

    def _i1(self, h: int) -> int:
        return h & (self.n_buckets - 1)

    def _i2(self, i1: int, fp: int) -> int:
        # partial-key cuckoo: alt index = i1 XOR hash(fp)
        return (i1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def add(self, h: int, _rng_state: int = 0) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if empty.size:
                self.table[i, empty[0]] = fp
                self.n_items += 1
                return True
        # kick loop (deterministic slot choice: rotate by attempt count)
        i = i1 if (h & 1) == 0 else i2
        for attempt in range(self.MAX_KICKS):
            slot = attempt % self.SLOTS
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            empty = np.where(self.table[i] == 0)[0]
            if empty.size:
                self.table[i, empty[0]] = fp
                self.n_items += 1
                return True
        return False  # table full — caller must fall back to exact path

    def maybe_contains(self, hashes) -> np.ndarray:
        arr = np.atleast_1d(np.asarray(hashes, dtype=np.int64))
        out = np.zeros(arr.shape[0], dtype=bool)
        for j, h in enumerate(arr):
            h = int(h)
            fp = self._fp(h)
            i1 = self._i1(h)
            i2 = self._i2(i1, fp)
            out[j] = bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())
        return out

    def delete(self, h: int) -> bool:
        h = int(h)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            hit = np.where(self.table[i] == fp)[0]
            if hit.size:
                self.table[i, hit[0]] = 0
                self.n_items -= 1
                return True
        return False

    def _add_fp(self, i1: int, fp: int) -> bool:
        """Insert a (bucket, fingerprint) pair directly — partial-key
        hashing means (i1, fp) fully determines both candidate buckets,
        so same-size cuckoo filters merge by re-inserting stored pairs."""
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if empty.size:
                self.table[i, empty[0]] = fp
                self.n_items += 1
                return True
        i = i1
        for attempt in range(self.MAX_KICKS):
            slot = attempt % self.SLOTS
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            empty = np.where(self.table[i] == 0)[0]
            if empty.size:
                self.table[i, empty[0]] = fp
                self.n_items += 1
                return True
        return False

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Merge same-size filters by re-inserting the other's stored
        (bucket, fingerprint) pairs. Raises on overflow — the caller must
        rebuild the shard from the exact seen table instead (overflow
        would otherwise silently drop keys => sketch false negatives)."""
        assert self.n_buckets == other.n_buckets
        for i1, slot in zip(*np.nonzero(other.table)):
            if not self._add_fp(int(i1), int(other.table[i1, slot])):
                raise OverflowError("cuckoo merge overflow — rebuild shard")
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        table = np.frombuffer(data, dtype=np.uint16).copy()
        n_buckets = table.shape[0] // cls.SLOTS
        f = cls(n_buckets=n_buckets, table=table.reshape(n_buckets, cls.SLOTS))
        f.n_items = int(np.count_nonzero(f.table))
        return f
