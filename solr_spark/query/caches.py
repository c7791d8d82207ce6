"""Filter cache / query-result cache analogs.

Reference: ``SolrIndexSearcher`` keeps two famous caches
(``solrconfig.xml <filterCache>`` / ``<queryResultCache>``,
``search/SolrIndexSearcher.java`` getDocSet/getDocListC,
``search/CaffeineCache.java``): filter queries compile to reusable
DocSets, and (query, sort, page-window) result lists are memoized.

Spark-first restatement: a DocSet IS a persisted ``doc_id`` DataFrame —
``.persist(MEMORY_AND_DISK)`` gives the same amortization Solr's
filterCache gives (compute once, every later query joins against the
cached bitset-equivalent), with Spark handling distribution, memory
pressure and spill. This module adds what ``.persist`` alone lacks:
a keyed registry (same fq string → same cached plan), LRU bounded size
with real ``unpersist`` on eviction, and hit/miss/eviction counters
matching the cache stats Solr exposes on the admin page.

The query-result cache memoizes COLLECTED top-k pages (small driver
lists, like Solr's docID+score windows) keyed by (query, mode, k) —
a second identical request costs zero Spark jobs.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class FilterCache:
    """LRU cache of persisted filter-result DataFrames (DocSet analog).

    ``get(key, build)`` returns the cached persisted DataFrame for
    ``key`` or builds+persists it. Eviction unpersists, so the executor
    memory the reference bounds with ``<filterCache size=N>`` is bounded
    the same way here.
    """

    def __init__(self, max_size: int = 64,
                 storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK):
        self.max_size = max_size
        self.storage_level = storage_level
        self._entries: "OrderedDict[str, DataFrame]" = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get(self, key: str, build: Callable[[], DataFrame]) -> DataFrame:
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        df = build().persist(self.storage_level)
        self._entries[key] = df
        if len(self._entries) > self.max_size:
            _, old = self._entries.popitem(last=False)
            old.unpersist()
            self.evictions += 1
        return df

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()

    def stats(self) -> dict:
        """The admin-page stat block (CaffeineCache.getMetrics analog)."""
        lookups = self.hits + self.misses
        return {
            "lookups": lookups,
            "hits": self.hits,
            "misses": self.misses,
            "evictions": self.evictions,
            "size": len(self._entries),
            "hitratio": round(self.hits / lookups, 4) if lookups else 0.0,
        }


class QueryResultCache:
    """Memoized top-k result windows (queryResultCache analog): keyed by
    (query, mode, k), stores the COLLECTED rows — a repeat request is a
    pure driver lookup, zero Spark jobs (Solr stores the docID+score
    window the same way)."""

    def __init__(self, max_size: int = 512):
        self.max_size = max_size
        self._entries: "OrderedDict[tuple, list]" = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get(self, key: tuple, run: Callable[[], list]) -> list:
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        rows = run()
        self._entries[key] = rows
        if len(self._entries) > self.max_size:
            self._entries.popitem(last=False)
            self.evictions += 1
        return rows

    def stats(self) -> dict:
        lookups = self.hits + self.misses
        return {
            "lookups": lookups,
            "hits": self.hits,
            "misses": self.misses,
            "evictions": self.evictions,
            "size": len(self._entries),
            "hitratio": round(self.hits / lookups, 4) if lookups else 0.0,
        }
