"""Query cache: LRU over filter-shaped docid sets.

Behavioral analog of the reference's LRUQueryCache + caching policy
(lucene/core/src/java/org/apache/lucene/search/LRUQueryCache.java:119;
UsageTrackingQueryCachingPolicy.java:33 — a filter is cached only after it
RECURS, so one-off queries never pay the materialization cost):

  - only FILTER shapes are cached (constant-score nodes: ranges, term
    sets) — scoring queries are not (their cost is the scorer, not the
    docid set; same restriction as the reference, LRUQueryCache caches
    DocIdSets, not scores);
  - entries hold the RAW docid set, BEFORE live-docs filtering: deletes
    are applied by the caller after retrieval, so tombstoning never
    invalidates the cache (the reference keys per segment CORE and applies
    liveDocs at read for the same reason, LRUQueryCache.java:262-280);
  - the distributed analog of a cached per-segment bitset is a persisted
    Spark DataFrame (MEMORY_AND_DISK); eviction unpersists it;
  - hit/miss/eviction counters mirror LRUQueryCache's getHitCount /
    getMissCount stats API.

Off by default — enable per Index with ``Index.enable_query_cache()``.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class QueryCache:
    def __init__(self, max_entries: int = 32, min_frequency: int = 2,
                 history_size: int = 256):
        self.max_entries = max_entries
        self.min_frequency = min_frequency
        # Bounded recent-history of key sightings (LRU of the last
        # ``history_size`` distinct keys), mirroring the reference policy's
        # fixed ring buffer (UsageTrackingQueryCachingPolicy.java:33,
        # FrequencyTrackingRingBuffer) — a long-lived searcher issuing many
        # one-off filters must not grow driver memory, and a key that
        # recurred long ago ages out of persist-eligibility (ADVICE r3).
        self.history_size = history_size
        self._freq: "OrderedDict[str, int]" = OrderedDict()
        self._cache: "OrderedDict[str, DataFrame]" = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get_or_compute(self, key: str, compute: Callable[[], DataFrame]) -> DataFrame:
        """Cached docid-set DataFrame for ``key``, computing (and — once
        the key has recurred ``min_frequency`` times within the recent
        history window — persisting) it."""
        hit = self._cache.get(key)
        if hit is not None:
            self.hits += 1
            self._cache.move_to_end(key)
            return hit
        self.misses += 1
        self._freq[key] = self._freq.get(key, 0) + 1
        self._freq.move_to_end(key)
        while len(self._freq) > self.history_size:
            self._freq.popitem(last=False)
        df = compute()
        if self._freq[key] >= self.min_frequency:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            self._cache[key] = df
            if len(self._cache) > self.max_entries:
                _, old = self._cache.popitem(last=False)
                old.unpersist()
                self.evictions += 1
        return df

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {
            "hits": self.hits,
            "misses": self.misses,
            "evictions": self.evictions,
            "entries": len(self._cache),
            "hit_rate": (self.hits / total) if total else 0.0,
        }

    def clear(self) -> None:
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
        self._freq.clear()
        self.hits = self.misses = self.evictions = 0
