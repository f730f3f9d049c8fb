"""Session-scoped persisted-plan cache (index-at-ingest semantics).

Several operators are two-phase at deployment scale: a corpus-wide
INDEX build (minhash shingles, LSH band signatures, IVF cell
assignment) followed by a per-request SEARCH. The reference's analogue
is its layer attribute store: metadata/derived structures are computed
at ingest, requests only read them (Utils.scala:22-23). On a cluster
the index is a materialized table; in a long-lived local session the
equivalent is a persisted DataFrame reused across requests. This cache
provides that reuse with the locking/eviction discipline the shingle
cache pioneered (operators/dedup.py): bounded LRU, eviction unpersists,
and all mutation under one lock (a concurrent popitem between another
thread's membership check and lookup would raise KeyError; racing
inserts would double-persist a plan).

Keys are ``(applicationId, semanticHash(analyzed plan), tag)`` — the
same corpus expressed by a semantically-equal plan hits, a different
corpus or session misses. ``applicationId`` is stable for the life of
the SparkContext and never reused after GC (unlike ``id(session)``,
which CPython can hand to a NEW session once the old one is collected —
a long-lived service could then serve a stale index). When no stable
identity exists the build runs uncached (correct, just not amortized).

CAVEAT (documented contract, not detectable from the plan): the
semantic hash keys the QUERY, not the DATA — replacing the underlying
table's files in place yields the same hash, so corpus replacement in a
live session requires ``PlanCache.clear()`` /
``clear_similarity_index_cache()``, or passing a changed
``data_version`` token that is folded into the key.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame


def session_token(df: DataFrame):
    """Stable identity for the session owning ``df``'s plan: the
    SparkContext applicationId (unique per context, never GC-reused).
    Raises when no context is reachable (caller treats as uncacheable)."""
    return df.sparkSession.sparkContext.applicationId


class PlanCache:
    def __init__(self, max_entries: int = 8) -> None:
        self._max = max_entries
        self._cache: OrderedDict[tuple, DataFrame] = OrderedDict()
        # Reentrant: composite indexes build on top of cached base
        # indexes (the int8 IVF index wraps _ivf_index), so build()
        # may re-enter get_or_persist on the same thread.
        self._lock = threading.RLock()

    def get_or_persist(
        self,
        source: DataFrame,
        tag: str,
        build: Callable[[DataFrame], DataFrame],
        data_version: object = None,
    ) -> DataFrame:
        """Return ``build(source)`` persisted, reusing a previous persist
        for a semantically-equal ``source`` plan under the same ``tag``.
        Pass a changed ``data_version`` (any hashable — an ingest epoch,
        snapshot id, or mtime) when the same plan can point at replaced
        data; otherwise call :meth:`clear` on corpus replacement."""
        try:
            key = (
                session_token(source),
                source._jdf.queryExecution().analyzed().semanticHash(),
                tag,
                data_version,
            )
        except Exception:
            return build(source)
        with self._lock:
            cached = self._cache.get(key)
            if cached is not None:
                self._cache.move_to_end(key)
                return cached
            evicted = []
            while len(self._cache) >= self._max:
                evicted.append(self._cache.popitem(last=False)[1])
            df = build(source).persist()
            self._cache[key] = df
        for old in evicted:
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
        return df

    def clear(self) -> None:
        """Unpersist and drop every entry (e.g. between corpora in a
        long-lived service session)."""
        with self._lock:
            dropped = list(self._cache.values())
            self._cache.clear()
        for df in dropped:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass

    def __len__(self) -> int:
        with self._lock:
            return len(self._cache)
