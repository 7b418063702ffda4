"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given scale
factor, runs the paired ``oracle_sql()`` in DuckDB over the same parquet
tables, and compares row count + column names + an order-insensitive value
hash (columns sorted by name, values canonicalized, rows sorted). Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import sys
import time
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(rows: list[dict]) -> tuple[int, tuple[str, ...], str]:
    if not rows:
        return 0, (), "empty"
    cols = tuple(sorted(rows[0].keys()))
    lines = sorted("\x1f".join(canon(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from zylyty_data_engineer_challenge_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL unknown query names: {sorted(unknown)}")
        failures.extend(sorted(unknown))
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict(recursive=True) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        s_n, s_cols, s_h = table_hash(srows)
        if name not in oracles:
            print(f"WEAK {name}: rows={s_n} (no oracle; rows-only check)")
            continue
        try:
            orows = con.execute(oracles[name]).fetchall()
            ocols = [d[0] for d in con.description]
            odicts = [dict(zip(ocols, r)) for r in orows]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        o_n, o_cols, o_h = table_hash(odicts)
        ok = (s_n, s_cols, s_h) == (o_n, o_cols, o_h)
        dt = time.time() - t0
        if ok:
            print(f"PASS {name}: rows={s_n} hash={s_h} ({dt:.1f}s)")
        else:
            failures.append(name)
            print(
                f"FAIL {name}: spark(n={s_n}, cols={s_cols}, h={s_h}) "
                f"vs oracle(n={o_n}, cols={o_cols}, h={o_h})"
            )
            # show a tiny diff sample
            sset = {
                "\x1f".join(canon(r[c]) for c in s_cols) for r in srows
            } if srows else set()
            oset = {
                "\x1f".join(canon(r[c]) for c in o_cols) for r in odicts
            } if odicts else set()
            for label, diff in [("spark-only", sset - oset), ("oracle-only", oset - sset)]:
                for line in list(diff)[:3]:
                    print(f"    {label}: {line.replace(chr(31), ' | ')}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
