"""Property-based tests for the ingest cleaning layer.

The oracle differential pins t1/t3/t4 against DuckDB on the fixture; these
hypothesis tests pin the cleaning PRIMITIVES against an independent pandas
model on adversarial inputs the fixture never produces — duplicate keys
with shuffled arrival order, NULL-heavy columns, numeric strings with
whitespace/sign/garbage — so the keep-first and coerce semantics hold for
any upstream, not just the TPC-H-shaped one.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.etl.clean import (
    coerce_amount,
    dedup_keep_first,
)

# small key space forces collisions; arrival ordinals are made unique by
# enumeration, mirroring the ingest layer's page*limit+offset ordinal
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key
        st.integers(min_value=-1000, max_value=1000),  # payload
    ),
    min_size=1,
    max_size=60,
)

_amounts = st.lists(
    st.one_of(
        st.none(),
        st.just(""),
        st.just("N/A"),
        st.just("  12.5 "),
        st.just("-0.01"),
        st.just("1e2"),
        st.just("abc"),
        st.from_regex(r"-?[0-9]{1,6}(\.[0-9]{1,2})?", fullmatch=True),
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=15,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(_rows)
@_SETTINGS
def test_dedup_keep_first_matches_pandas_model(spark, rows):
    pdf = pd.DataFrame(
        {
            "key": [k for k, _ in rows],
            "payload": [v for _, v in rows],
            "_arrival": range(len(rows)),
        }
    )
    # shuffle input partitioning so "first" cannot come from physical order
    df = spark.createDataFrame(pdf).repartition(4)
    got = {
        (r["key"], r["payload"], r["_arrival"])
        for r in dedup_keep_first(df, ["key"]).collect()
    }
    model = pdf.sort_values("_arrival").groupby("key", as_index=False).first()
    # itertuples mangles the leading-underscore column name; zip instead
    want = set(
        zip(model["key"], model["payload"], model["_arrival"], strict=True)
    )
    assert got == want


@given(_amounts)
@_SETTINGS
def test_coerce_amount_matches_pandas_model(spark, amounts):
    pdf = pd.DataFrame({"amount": pd.Series(amounts, dtype="object")})
    df = spark.createDataFrame(pdf)
    got = [r["amount"] for r in coerce_amount(df).collect()]
    want = (
        pd.to_numeric(pdf["amount"].str.strip(), errors="coerce")
        .fillna(0)
        .tolist()
    )
    assert len(got) == len(want)
    for g, w in zip(sorted(got), sorted(Decimal(str(x)) for x in want)):
        # decimal(10,2) truncation tolerance: the reference quantizes to
        # cents; compare at 2dp
        assert abs(Decimal(g) - w.quantize(Decimal("0.01"))) <= Decimal(
            "0.01"
        ), (g, w)
