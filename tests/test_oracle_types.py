"""Full-sweep oracle type audit (r4 verdict item #1).

Every oracle_sql() string is type-checked in DuckDB with a LIMIT-0
bind: any HUGEINT/UHUGEINT output column would serialize differently
from Spark's BIGINT in the driver's value hash and go red whenever the
rotating 50-query sample lands on it. This pins the whole 240-oracle
surface at zero wide-integer columns, using the smallest SF so the
bind (not execution) dominates.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_oracle_columns(con):
    import __spark_entry__ as entrymod

    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    oracles = entrymod.oracle_sql()
    assert len(oracles) > 200
    for name, sql in oracles.items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) __q LIMIT 0")
        except Exception as ex:  # bind error is its own failure
            errors[name] = str(ex)[:200]
            continue
        huge = [f"{c}:{tp}" for c, tp in zip(rel.columns, rel.types)
                if "HUGEINT" in str(tp)]
        if huge:
            offenders[name] = huge
    assert not errors, f"oracle bind errors: {errors}"
    assert not offenders, (
        f"HUGEINT oracle columns (CAST to BIGINT): {offenders}")
