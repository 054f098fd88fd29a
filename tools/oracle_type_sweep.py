"""DESCRIBE every oracle_sql() entry on DuckDB and flag columns whose
type the driver hashes differently from Spark's output (HUGEINT from an
un-cast sum(), DECIMAL from un-cast integer division, ...).  Pure
DuckDB — no Spark session — so it runs in seconds and belongs in every
pre-commit sweep.

    python tools/oracle_type_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

RISKY = ("HUGEINT", "INT128", "DECIMAL", "UTINYINT", "USMALLINT",
         "UINTEGER", "UBIGINT", "TINYINT", "SMALLINT", "FLOAT")

# Spark simpleString -> the DuckDB type(s) that hash identically under
# the driver's typed comparison.  Anything not listed compares by
# whole-family prefix (arrays, structs) and is reported, not failed.
_PARITY = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def _parity_issues(s_fields, d_types):
    """Compare a Spark schema against DESCRIBE output by column name."""
    issues = []
    for f in s_fields:
        dt = d_types.get(f.name)
        if dt is None:
            issues.append(f"{f.name}: missing from oracle")
            continue
        st = f.dataType.simpleString()
        want = _PARITY.get(st)
        if want is not None:
            if dt.upper() not in want:
                issues.append(f"{f.name}: spark={st} duckdb={dt}")
        elif st.startswith("array<") != dt.upper().endswith("[]"):
            issues.append(f"{f.name}: spark={st} duckdb={dt}")
    for c in d_types:
        if c not in {f.name for f in s_fields}:
            issues.append(f"{c}: oracle-only column")
    return issues


def main():
    import duckdb

    from __spark_entry__ import oracle_sql

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    with_spark = "--spark" in sys.argv
    spark = None
    qs = {}
    if with_spark:
        from __spark_entry__ import queries
        from dataframeintervals_jl_spark import get_spark

        spark = get_spark(cpus=8)
        qs = queries()

    bad = 0
    for name, sql in oracle_sql().items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            bad += 1
            continue
        d_types = {r[0]: r[1] for r in rows}
        risky = [
            f"{c}:{t}"
            for c, t in d_types.items()
            if any(k in t.upper() for k in RISKY)
        ]
        if risky:
            print(f"RISK {name}: {risky}")
            bad += 1
        if with_spark and name in qs:
            try:
                schema = qs[name](spark, sf_dir).schema
            except Exception as e:
                print(f"ERR  {name}: spark build failed: {e}")
                bad += 1
                continue
            issues = _parity_issues(schema.fields, d_types)
            if issues:
                print(f"TYPE {name}: {issues}")
                bad += 1
    if spark is not None:
        spark.stop()
    print(f"\n{'ALL CLEAN' if not bad else f'{bad} oracles flagged'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
