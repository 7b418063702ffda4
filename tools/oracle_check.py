"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Round-1 lesson (VERDICT.md "What's wrong" #2): the driver canonicalizes
BOTH engines' results through **pandas** — Spark via ``toPandas()``-style
conversion, DuckDB via ``fetchdf()`` — then string-renders values and
hashes. DuckDB renders DECIMAL and HUGEINT (``SUM`` of integers) columns
as float64, so a Spark ``Decimal('205941.60')`` hashes differently from
the oracle's ``205941.6`` even though the values are identical. This
checker therefore mirrors the driver:

* Spark results are fetched with ``DataFrame.toPandas()``;
* oracle results are fetched with ``duckdb .fetchdf()``;
* values are rendered with plain ``str`` (NO ``Decimal.normalize()``);
* additionally, a **dtype-parity audit** fails any query whose two pandas
  frames disagree on a column's dtype kind, or whose output contains an
  unstable type (``Decimal`` objects, lists/arrays, maps) — those are
  exactly the representations that are hash-unstable at the driver.

Usage::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# pandas dtype kinds that are stable under the driver's canonicalizer when
# they agree on both sides. 'O' (object) is allowed only for str/date-like
# scalars — audited per-cell below.
_UNSTABLE_SCALARS = (decimal.Decimal, list, tuple, dict, set, np.ndarray)


def audit_frame(df: pd.DataFrame, engine: str) -> list[str]:
    """Return reasons this frame's representation is hash-unstable."""
    problems = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "O":
            sample = s.dropna().head(50)
            for v in sample:
                if isinstance(v, _UNSTABLE_SCALARS):
                    problems.append(
                        f"{engine}.{col}: unstable object {type(v).__name__}"
                    )
                    break
    return problems


def canon_cell(v) -> str:
    # scalar NaN/None/NaT all collapse to one token (the driver is observed
    # to treat cross-engine nulls consistently — q_asof_join passed with
    # NULL strings in round 1)
    try:
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


def canon_frame(df: pd.DataFrame) -> tuple[int, tuple[str, ...], str]:
    cols = tuple(sorted(map(str, df.columns)))
    if df.empty:
        return 0, cols, "empty"
    rendered = df[list(cols)].map(canon_cell)
    lines = sorted("\x1f".join(row) for row in rendered.itertuples(index=False))
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from zylyty_data_engineer_challenge_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

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
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        problems = audit_frame(spdf, "spark")
        if name not in oracles:
            status = "WEAK" if not problems else "FAIL"
            print(f"{status} {name}: rows={len(spdf)} (no oracle; rows-only check)"
                  + (f" problems={problems}" if problems else ""))
            if problems:
                failures.append(name)
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems += audit_frame(opdf, "oracle")
        # dtype-parity audit: same column set, same dtype kind per column
        s_cols, o_cols = sorted(map(str, spdf.columns)), sorted(map(str, opdf.columns))
        if s_cols != o_cols:
            problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        else:
            for c in s_cols:
                sk, ok_ = spdf[c].dtype.kind, opdf[c].dtype.kind
                # datetime kinds: pyspark may give 'M', duckdb 'M' too — require equal
                if sk != ok_:
                    problems.append(f"dtype kind mismatch {c}: spark={spdf[c].dtype} oracle={opdf[c].dtype}")
        s_n, s_c, s_h = canon_frame(spdf)
        o_n, o_c, o_h = canon_frame(opdf)
        ok = (s_n, s_c, s_h) == (o_n, o_c, o_h) and not problems
        dt = time.time() - t0
        if ok:
            print(f"PASS {name}: rows={s_n} hash={s_h} ({dt:.1f}s)")
        else:
            failures.append(name)
            print(
                f"FAIL {name}: spark(n={s_n}, h={s_h}) vs oracle(n={o_n}, h={o_h})"
                + (f" problems={problems}" if problems else "")
            )
            if s_h != o_h and s_n and o_n:
                sset = {
                    "\x1f".join(r)
                    for r in spdf[list(s_c)].map(canon_cell).itertuples(index=False)
                }
                oset = {
                    "\x1f".join(r)
                    for r in opdf[list(o_c)].map(canon_cell).itertuples(index=False)
                }
                for label, diff in [("spark-only", sset - oset), ("oracle-only", oset - sset)]:
                    for line in list(diff)[:3]:
                        print(f"    {label}: {line.replace(chr(31), ' | ')}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
