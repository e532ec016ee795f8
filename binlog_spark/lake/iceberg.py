"""Optional Apache Iceberg backend behind the LakeTable interface.

The engine's own lake (``lake.table.LakeTable``) is a snapshot-log table
format designed to map 1:1 onto Iceberg: bucketed data files, an
append-only snapshot log with per-snapshot ``batch_id`` for exactly-once
MERGE, tombstone rows filtered on read, compaction as a rewrite commit.
When the runtime actually has the Iceberg Spark runtime jar on the
classpath (it does NOT in this sandbox — no jar downloads), this module
offers the same replay-facing surface backed by a real Iceberg catalog
table, keeping the semantics honest against the real thing.

Surface parity (what ``cdc.replay.replay`` consumes):
``create() / committed_batch_ids() / merge(spark, upserts, batch_id,
offsets) / read(spark) / current_snapshot_id()``.

Exactly-once: Iceberg snapshot summaries carry custom properties; the
shim records ``binlog.batch-id`` via the write option
``snapshot-property.binlog.batch-id`` (public Iceberg Spark option) and
recovers the committed set from the ``<table>.snapshots`` metadata
table — the same idempotence contract LakeTable implements with its
snapshot log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.pipeline import DATA_COLS, KEY_COLS

#: snapshot-summary key carrying the engine's batch id
BATCH_PROP = "binlog.batch-id"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


class IcebergLakeTable:
    """LakeTable's replay-facing surface over a real Iceberg table.

    ``identifier`` is a catalog-qualified table name (e.g.
    ``local.db.repo_files``); the catalog must be configured on the
    SparkSession (``spark.sql.catalog.local = org.apache.iceberg...``).
    Commit-order metadata (log_file/log_pos/seq_in_tx/op) is persisted
    with every row exactly as LakeTable does, so MERGE stays a
    last-writer-wins reduction and deletes stay filterable tombstones if
    a non-CDC writer ever appends.
    """

    def __init__(self, spark: SparkSession, identifier: str,
                 n_buckets: int = 32,
                 key_cols: tuple = KEY_COLS) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath; use "
                "lake.table.LakeTable (the built-in snapshot-log format)")
        self.spark = spark
        self.identifier = identifier
        self.n_buckets = n_buckets
        self.key_cols = tuple(key_cols)

    META_COLS = (("op", "string"), ("log_file", "string"),
                 ("log_pos", "bigint"), ("seq_in_tx", "int"))

    def create(self, schema_cols: list[str] | None = None,
               schema_types: dict[str, str] | None = None) -> None:
        cols = list(schema_cols or (*self.key_cols, *DATA_COLS))
        types = dict(schema_types or {})
        defs = ", ".join(
            f"`{c}` {types.get(c, 'string')}" for c in cols)
        meta = ", ".join(f"`{c}` {t}" for c, t in self.META_COLS)
        bucket_key = self.key_cols[0]
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.identifier} "
            f"({defs}, {meta}) USING iceberg "
            # same layout contract as LakeTable: co-locate each key's
            # history so the MERGE shuffles once on the bucket hash
            f"PARTITIONED BY (bucket({self.n_buckets}, `{bucket_key}`))")

    def committed_batch_ids(self) -> set[str]:
        rows = self.spark.sql(
            f"SELECT summary['{BATCH_PROP}'] AS b "
            f"FROM {self.identifier}.snapshots").collect()
        return {r.b for r in rows if r.b}

    def current_snapshot_id(self) -> int | None:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").first()
        return row.snapshot_id if row else None

    def merge(self, spark: SparkSession, upserts: DataFrame,
              batch_id: str, offsets: dict | None = None) -> dict:
        """Exactly-once MERGE of a reduced upsert batch (one row per
        key, op in {I,U,D}) — LakeTable.merge's contract on Iceberg.

        Single-pass: the upsert pipeline executes once into the MERGE;
        re-delivery of a committed batch_id is a no-op (snapshot-summary
        lookup), and a crash mid-retry re-runs an idempotent MERGE (the
        reduced batch is deterministic per batch_id)."""
        if batch_id in self.committed_batch_ids():
            return {"skipped": True, "batch_id": batch_id}
        view = f"binlog_batch_{abs(hash(batch_id)) % (1 << 30):x}"
        up = upserts
        for c, t in self.META_COLS:
            if c not in up.columns:
                up = up.withColumn(c, F.lit(None).cast(t))
        up.createOrReplaceTempView(view)
        spark.conf.set(
            f"spark.sql.iceberg.snapshot-property.{BATCH_PROP}", batch_id)
        if offsets:
            for k, v in offsets.items():
                spark.conf.set(
                    f"spark.sql.iceberg.snapshot-property.binlog.{k}",
                    str(v))
        try:
            keys_eq = " AND ".join(
                f"t.`{k}` <=> s.`{k}`" for k in self.key_cols)
            cols = [f.name for f in up.schema.fields]
            sets = ", ".join(f"t.`{c}` = s.`{c}`" for c in cols)
            names = ", ".join(f"`{c}`" for c in cols)
            vals = ", ".join(f"s.`{c}`" for c in cols)
            spark.sql(
                f"MERGE INTO {self.identifier} t USING {view} s "
                f"ON {keys_eq} "
                f"WHEN MATCHED AND s.op = 'D' THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED AND s.op != 'D' "
                f"THEN INSERT ({names}) VALUES ({vals})")
        finally:
            spark.catalog.dropTempView(view)
        return {"batch_id": batch_id,
                "snapshot_id": self.current_snapshot_id()}

    def read(self, spark: SparkSession) -> DataFrame:
        # hard deletes above -> no tombstone filter needed; keep the
        # projection parity with LakeTable.read (no meta columns)
        df = spark.table(self.identifier)
        meta = {c for c, _ in self.META_COLS} - {"op"}
        return df.drop("op", *meta)

    def snapshots(self) -> list[dict]:
        rows = self.spark.sql(
            f"SELECT snapshot_id, committed_at, summary "
            f"FROM {self.identifier}.snapshots "
            f"ORDER BY committed_at").collect()
        return [{"snapshot_id": r.snapshot_id,
                 "committed_at": str(r.committed_at),
                 "batch_id": (r.summary or {}).get(BATCH_PROP)}
                for r in rows]
