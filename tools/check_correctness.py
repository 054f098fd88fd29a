"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf directory, then compares row count, column
names, and an order-insensitive value multiset.  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, ".")


def normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (floats via repr of round-trip), count row multiset."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "~null~"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return Counter(tuple(canon(row[i]) for i in order) for row in rows)


def main():
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from dataframeintervals_jl_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cpus=16)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = queries()
    oracles = oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(s_rows)} rows, cols={s_cols}")
            continue
        try:
            # DESCRIBE gives exact DuckDB types (HUGEINT, DECIMAL(38,0),
            # ...); DB-API cursor.description flattens them to generic
            # codes ('NUMBER'), which is how the r11 HUGEINT failures
            # slipped past this gate.
            d_types = {
                r[0]: r[1]
                for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            }
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        # The driver hashes typed values: DuckDB HUGEINT (un-cast sum of
        # BIGINT) or DECIMAL hash differently from Spark int64 even at
        # equal values.  Flag those oracle columns as hash risks.
        risky = [
            f"{c}:{t}"
            for c, t in d_types.items()
            if any(k in t.upper() for k in ("HUGEINT", "INT128", "DECIMAL"))
        ]
        if risky:
            problems.append(f"oracle type hash-risk (cast to BIGINT/DOUBLE): {risky}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if ns != nd:
                diff_s = list((ns - nd).items())[:3]
                diff_d = list((nd - ns).items())[:3]
                problems.append(
                    f"values differ; spark-only={diff_s} duckdb-only={diff_d}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    spark.stop()
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
