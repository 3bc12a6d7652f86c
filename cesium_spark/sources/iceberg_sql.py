"""Iceberg SQL builders — the exact statements the ``backend='iceberg'``
branch of :class:`TableIO` executes on a real cluster.

The sandbox ships no iceberg-spark-runtime jar, so these statements
cannot be executed here; they are therefore PURE string builders,
pinned against golden files in ``tests/golden/iceberg/*.sql`` (r4
verdict item #8 — the dress rehearsal: the first real-cluster run must
not be the first time this code path is read).

Semantics mirrored from the parquet twin, statement for statement:

- ``create_table_ddl`` — CTAS-less CREATE with partition TRANSFORMS:
  ``days(ts)`` for the retention-tier layout and ``bucket(N, conv_id)``
  for co-located joins (the write_bucketed twin; Iceberg buckets are a
  partition transform, not a Hive bucket spec).
- ``overwrite_partitions_sql`` — idempotent window-level MERGE of a
  continuous-aggregate refresh: Iceberg's dynamic ``INSERT OVERWRITE``
  replaces exactly the partitions present in the source (same
  semantics as the parquet twin's dynamic partitionOverwriteMode).
- ``merge_upsert_sql`` — keyed upsert (compaction.upsert_latest twin):
  ``MERGE INTO`` on the key with update-all/insert-all arms.
- ``delete_where_sql`` — retention expiry (``delete_where`` twin).
- ``expire_snapshots_sql`` — the Iceberg-only maintenance call the
  checkpoint/lineage ledger schedules after retention deletes.

All identifiers pass through ``_q`` (backtick quoting) so a hostile
column name cannot break the statement; predicates are caller-supplied
SQL by contract (same as ``delete_where``).
"""

from __future__ import annotations


def _q(ident: str) -> str:
    return "`" + ident.replace("`", "``") + "`"


def create_table_ddl(name: str, columns: list[tuple[str, str]],
                     partition_transforms: list[str] | None = None,
                     props: dict[str, str] | None = None) -> str:
    cols = ",\n  ".join(f"{_q(c)} {t}" for c, t in columns)
    sql = f"CREATE TABLE IF NOT EXISTS {name} (\n  {cols}\n) USING iceberg"
    if partition_transforms:
        sql += "\nPARTITIONED BY (" + ", ".join(partition_transforms) + ")"
    if props:
        kv = ", ".join(f"'{k}' = '{v}'" for k, v in sorted(props.items()))
        sql += f"\nTBLPROPERTIES ({kv})"
    return sql


def bucket_transform(n: int, col: str) -> str:
    if n < 1:
        raise ValueError(f"bucket count must be >= 1, got {n}")
    return f"bucket({int(n)}, {_q(col)})"


def days_transform(col: str) -> str:
    return f"days({_q(col)})"


def overwrite_partitions_sql(target: str, source_view: str) -> str:
    # requires spark.sql.sources.partitionOverwriteMode=dynamic (set in
    # session.get_spark) — replaces exactly the partitions present in
    # the source, the continuous-aggregate refresh contract
    return (f"INSERT OVERWRITE {target}\n"
            f"SELECT * FROM {source_view}")


def merge_upsert_sql(target: str, source_view: str,
                     key_cols: list[str],
                     update_cols: list[str]) -> str:
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not update_cols:
        raise ValueError("update_cols must be non-empty")
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in update_cols)
    return (f"MERGE INTO {target} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED THEN UPDATE SET {sets}\n"
            f"WHEN NOT MATCHED THEN INSERT *")


def delete_where_sql(target: str, predicate: str) -> str:
    return f"DELETE FROM {target} WHERE {predicate}"


def expire_snapshots_sql(catalog: str, table: str,
                         older_than: str, retain_last: int = 2) -> str:
    return (f"CALL {catalog}.system.expire_snapshots("
            f"table => '{table}', "
            f"older_than => TIMESTAMP '{older_than}', "
            f"retain_last => {int(retain_last)})")
