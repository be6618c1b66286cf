"""url_store / id_map storage layer (SURVEY.md §2.1 S6-S13, §2.3 J1, M2).

The reference memoizes fetches in SQLite/MySQL behind a swappable Engine
seam (database/engine.go:22-64). Here the same seam is a snapshot-committed,
hash-bucketed Parquet table — a deliberately Iceberg-shaped design (the
sandbox has no Iceberg jars; on a real cluster ``ManifestTable`` is replaced
1:1 by an Iceberg table with ``bucket(key)`` partitioning and MERGE INTO):

- **Buckets**: rows land in ``bucket = pmod(key, n_buckets)``. A MERGE only
  rewrites the buckets that contain touched keys (copy-on-write), so upsert
  cost scales with the delta's key spread, not the table size. At 100 TB you
  raise ``n_buckets`` (2^12-2^16) so each bucket is a few GB.
- **Snapshots**: every commit writes an immutable manifest (bucket → file
  list) and atomically swings a CURRENT pointer. Readers pin a snapshot →
  crash-consistent checkpoint/resume and time travel for free (north rule).
- **Pruning**: point/batch lookups read only the buckets their keys hash to.

Semantics parity with the reference:
- REPLACE-by-key / last-write-wins (storage.go:29-30; 00001_init.sql:8,16)
- expired ⇒ not-found on read, lazy expiry (storage.go:184-186)
- alias resolution requested_key → id_map → canonical_key with fallback to
  the direct key on mapping miss (storage.go:143-155)
- self-referential id_map rows stored even when requested == canonical
  (storage.go:55-60,115; pinned by storage_test.go:221-236)
- delete is canonical-key-only; alias rows survive (storage.go:236-260;
  pinned by storage_test.go:161-174)
- maintenance physically drops expired rows (database/sqlite/maintenance.sql:2)
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrape_spark.functions.textfns import expires_at, is_fresh, stamp_fetch_time
from scrape_spark.functions.urlkeys import clean_url, url_key
from scrape_spark.schemas import DEFAULT_TTL_SECONDS, ID_MAP_SCHEMA, URL_STORE_SCHEMA

BUCKET_COL = "__bucket"


def bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.col(key_col), F.lit(n_buckets)).cast("int")


class ManifestTable:
    """Snapshot-committed bucketed Parquet table (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str, schema, key_col: str, n_buckets: int):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.key_col = key_col
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------------
    def _manifest_path(self, snap: int) -> str:
        return os.path.join(self.root, "_manifests", f"v{snap:08d}.json")

    def current_snapshot(self) -> int | None:
        cur = os.path.join(self.root, "_manifests", "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def _load_manifest(self, snap: int | None = None) -> dict:
        snap = self.current_snapshot() if snap is None else snap
        if snap is None:
            return {"snapshot": -1, "files": {}, "meta": {}}
        with open(self._manifest_path(snap)) as f:
            return json.load(f)

    def snapshots(self) -> list[int]:
        d = os.path.join(self.root, "_manifests")
        return sorted(
            int(n[1:-5]) for n in os.listdir(d) if n.startswith("v") and n.endswith(".json")
        )

    # -- read -----------------------------------------------------------------
    def read(self, snapshot: int | None = None, buckets: list[int] | None = None) -> DataFrame:
        man = self._load_manifest(snapshot)
        files: list[str] = []
        if buckets is None:
            for fl in man["files"].values():
                files.extend(fl)
        else:
            for b in buckets:
                files.extend(man["files"].get(str(b), []))
        if not files:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*files)

    # -- write ----------------------------------------------------------------
    def _write_files(self, df: DataFrame) -> dict[str, list[str]]:
        """Write df (must carry BUCKET_COL) as one file set; return bucket→files."""
        out_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        (
            df.repartition(BUCKET_COL)
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(out_dir)
        )
        bucket_files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            sub = os.path.join(out_dir, entry)
            bucket_files[b] = [
                os.path.join(sub, f) for f in os.listdir(sub) if f.endswith(".parquet")
            ]
        return bucket_files

    def _commit(self, files: dict[str, list[str]], meta: dict[str, Any]) -> int:
        prev = self.current_snapshot()
        snap = 0 if prev is None else prev + 1
        man = {"snapshot": snap, "parent": prev, "files": files, "meta": meta}
        path = self._manifest_path(snap)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, path)
        cur = os.path.join(self.root, "_manifests", "CURRENT")
        tmp = cur + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap))
        os.replace(tmp, cur)
        return snap

    def replace_buckets(
        self, df: DataFrame, touched: list[int], meta: dict[str, Any] | None = None
    ) -> int:
        """Copy-on-write commit: df supplies the full new content of `touched`
        buckets; all other buckets carry over from the current snapshot."""
        new_files = self._write_files(df.withColumn(BUCKET_COL, bucket_expr(self.key_col, self.n_buckets)))
        man = self._load_manifest()
        files = dict(man["files"])
        for b in touched:
            files.pop(str(b), None)
        for b, fl in new_files.items():
            files[b] = fl
        return self._commit(files, meta or {})

    def overwrite(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        new_files = self._write_files(df.withColumn(BUCKET_COL, bucket_expr(self.key_col, self.n_buckets)))
        return self._commit(new_files, meta or {})

    def truncate(self, meta: dict[str, Any] | None = None) -> int:
        return self._commit({}, meta or {"op": "truncate"})

    def touched_buckets(self, df: DataFrame) -> list[int]:
        rows = (
            df.select(bucket_expr(self.key_col, self.n_buckets).alias("b"))
            .where(F.col("b").isNotNull())
            .distinct()
            .collect()
        )
        return sorted(r.b for r in rows)

    def bytes_in_buckets(self, buckets: list[int] | None = None) -> int:
        """On-disk parquet bytes of the given buckets in the current snapshot
        (all buckets when None) — manifest metadata only, no scan. Used to
        size-gate broadcast decisions."""
        man = self._load_manifest()
        total = 0
        for b, fl in man["files"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            for f in fl:
                try:
                    total += os.path.getsize(f)
                except OSError:
                    pass
        return total


class UrlStore:
    """The reference's URLDataStore re-expressed over two ManifestTables."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
        ttl_seconds: int = DEFAULT_TTL_SECONDS,
        broadcast_threshold_bytes: int = 32 << 20,
    ):
        self.spark = spark
        self.ttl_seconds = ttl_seconds
        # Pruned id_map slices at or under this many on-disk parquet bytes are
        # broadcast in resolve_keys; larger slices shuffle (AQE decides).
        self.broadcast_threshold_bytes = broadcast_threshold_bytes
        self.urls = ManifestTable(
            spark, os.path.join(root, "urls"), URL_STORE_SCHEMA, "key", n_buckets
        )
        self.id_map = ManifestTable(
            spark, os.path.join(root, "id_map"), ID_MAP_SCHEMA, "requested_id", n_buckets
        )

    # -- save (S9): REPLACE INTO urls + id_map --------------------------------
    def merge(self, results: DataFrame, meta: dict[str, Any] | None = None) -> int:
        """Upsert result rows (RESULT_SCHEMA-ish; `original_url` is dropped —
        never stored). Error rows are NOT stored (internal/scrape.go:82-85).
        Also records requested→canonical alias rows, self-referential ones
        included."""
        cols = {f.name for f in URL_STORE_SCHEMA.fields}
        incoming = results.filter(F.col("error").isNull())
        incoming = incoming.withColumn(
            "fetch_time", F.coalesce(F.col("fetch_time"), stamp_fetch_time())
        ).withColumn(
            "expires",
            F.coalesce(F.col("expires"), expires_at("fetch_time", self.ttl_seconds)),
        )
        new_urls = incoming.select(*[F.col(c) for c in URL_STORE_SCHEMA.fieldNames() if c in cols])

        # alias rows: requested (parsed_url) key → canonical (url) key
        new_aliases = (
            incoming.select(
                url_key(F.col("parsed_url")).alias("requested_id"),
                F.col("key").alias("canonical_id"),
            )
            .where(F.col("requested_id").isNotNull())
            .dropDuplicates(["requested_id"])
        )

        snap = self._merge_table(self.urls, new_urls, "key", order_col="fetch_time", meta=meta)
        self._merge_table(self.id_map, new_aliases, "requested_id", order_col=None, meta=meta)
        return snap

    def _merge_table(
        self,
        table: ManifestTable,
        new_rows: DataFrame,
        key_col: str,
        order_col: str | None,
        meta: dict[str, Any] | None,
    ) -> int:
        new_rows = new_rows.cache()
        touched = table.touched_buckets(new_rows)
        if not touched:
            cur = table.current_snapshot()
            return cur if cur is not None else table._commit({}, meta or {})
        existing = table.read(buckets=touched).withColumn("__prec", F.lit(0))
        delta = new_rows.withColumn("__prec", F.lit(1))
        merged = existing.unionByName(delta)
        # last-write-wins by key; ties broken toward the incoming delta —
        # REPLACE semantics (storage.go:29-30). max_by over a lexicographic
        # (order_col, __prec) struct instead of a row_number window: a hash
        # aggregate with map-side partial combine, no per-key sort — the
        # shape that survives hot-key skew at 100 TB. Struct comparison puts
        # NULL order_col lowest, matching desc_nulls_last. Deterministic:
        # each side carries at most one row per key, and __prec splits them.
        cols = [c for c in merged.columns if c != "__prec"]
        ord_fields = [F.col("__prec")]
        if order_col:
            ord_fields = [F.col(order_col), F.col("__prec")]
        winner = (
            merged.groupBy(key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in cols if c != key_col]),
                    F.struct(*ord_fields),
                ).alias("__row")
            )
            .select(key_col, "__row.*")
        )
        snap = table.replace_buckets(winner, touched, meta=meta)
        new_rows.unpersist()
        return snap

    # -- read (S6 + J1 + F3) ---------------------------------------------------
    def resolve_keys(self, requested: DataFrame, key_col: str = "key") -> DataFrame:
        """J1 alias-resolution join: requested key → canonical key, falling
        back to the requested key on mapping miss.

        Scale posture: id_map has one row per stored URL — at a 10^10-URL
        frontier it is store-sized, NOT dim-sized, so it must never be
        unconditionally broadcast. The join is bucket-pruned first (id_map is
        hash-bucketed by requested_id, the join key, so only the buckets the
        batch's keys hash to are even opened), then broadcast ONLY when the
        pruned slice is provably small by manifest file size; otherwise it is
        a plain equi-join and AQE picks the physical strategy."""
        buckets = self.id_map.touched_buckets(requested.select(F.col(key_col).alias(self.id_map.key_col)))
        id_map = self.id_map.read(buckets=buckets)
        if self.id_map.bytes_in_buckets(buckets) <= self.broadcast_threshold_bytes:
            id_map = F.broadcast(id_map)
        return (
            requested.join(
                id_map,
                requested[key_col] == id_map["requested_id"],
                "left",
            )
            .withColumn("canonical_key", F.coalesce(F.col("canonical_id"), F.col(key_col)))
            .drop("requested_id", "canonical_id")
        )

    def fetch(self, urls: list[str]) -> DataFrame:
        """Point/batch lookup: clean → key → alias-resolve → bucket-pruned
        store read → freshness filter. Expired rows are invisible (F3)."""
        req = self.spark.createDataFrame([(u,) for u in urls], ["original_url"])
        req = req.withColumn("parsed_url", clean_url("original_url")).withColumn(
            "key", url_key("parsed_url")
        )
        resolved = self.resolve_keys(req).cache()
        buckets = sorted(
            r.b
            for r in resolved.select(
                bucket_expr("canonical_key", self.urls.n_buckets).alias("b")
            ).distinct().collect()
        )
        store = self.urls.read(buckets=buckets).filter(is_fresh("expires"))
        # keep only original_url + canonical_key on the probe side — the store
        # row carries parsed_url, and a duplicate name breaks downstream selects
        probe = resolved.select("original_url", "canonical_key")
        out = probe.join(
            store, probe["canonical_key"] == store["key"], "inner"
        ).drop("canonical_key")
        resolved.unpersist()
        return out

    # -- delete (S10): canonical key only; aliases survive ---------------------
    def delete(self, urls: list[str]) -> int:
        req = self.spark.createDataFrame([(u,) for u in urls], ["u"])
        req = req.withColumn("key", url_key(clean_url("u")))
        resolved = self.resolve_keys(req).select(F.col("canonical_key").alias("key"))
        touched = self.urls.touched_buckets(resolved)
        if not touched:
            cur = self.urls.current_snapshot()
            return cur if cur is not None else -1
        remaining = self.urls.read(buckets=touched).join(resolved, "key", "left_anti")
        return self.urls.replace_buckets(remaining, touched, meta={"op": "delete"})

    # -- clear (S11) ------------------------------------------------------------
    def clear(self) -> None:
        self.urls.truncate()
        self.id_map.truncate()

    # -- maintenance (S12): physical expiry + compaction ------------------------
    def maintain(self) -> int:
        live = self.urls.read().filter(is_fresh("expires"))
        return self.urls.overwrite(live, meta={"op": "maintain"})

    # -- stats (S13) -------------------------------------------------------------
    def stats(self) -> dict[str, int]:
        urls_df = self.urls.read()
        fresh = urls_df.filter(is_fresh("expires")).count()
        return {
            "total_rows": urls_df.count(),
            "fresh_rows": fresh,
            "id_map_rows": self.id_map.read().count(),
            "snapshot": self.urls.current_snapshot() if self.urls.current_snapshot() is not None else -1,
        }
