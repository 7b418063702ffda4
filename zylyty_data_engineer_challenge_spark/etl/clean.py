"""Transaction cleaning — the reference's T2/T3/T4 operators, Spark-first.

Reference semantics (`/root/reference/main.py:121-126`):

* T2 — empty input short-circuits (cleaning skipped, sink skipped).
* T3 — dedup on ``(timestamp, account_id)`` keeping the *first-arriving* row
  (pandas ``drop_duplicates`` default ``keep='first'``; arrival order is API
  page order).
* T4 — ``amount`` coerced to numeric; non-parseable / missing → exactly 0,
  not NULL (``to_numeric(errors='coerce').fillna(0)``).

Spark's ``dropDuplicates`` keeps an *arbitrary* row per key, which is only
correct when callers don't care which. To reproduce keep-first exactly and
deterministically on a distributed engine, ingestion attaches an arrival
ordinal (``page * page_limit + offset_in_page`` — stable across partitions,
unlike ``monotonically_increasing_id`` on a repartitioned frame) and dedup
keeps ``min_by(row, ordinal)`` per key.

Scale: the min_by hash aggregate is a single shuffle on the dedup key with
map-side partial combine (one candidate row per key per mapper) and no
per-partition sort — strictly cheaper than the row_number-window
formulation. Skewed keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: list[str],
    order_col: str = "_arrival",
) -> DataFrame:
    """T3: keep the first row per key by arrival ordinal (main.py:123).

    ``order_col`` must be a NON-NULL total order within each key group for
    the result to be deterministic; ingestion provides ``_arrival``
    (page * page_limit + offset, never null). min_by skips rows whose
    ordering value is NULL, so a null ordinal cannot win its group — the
    row_number formulation this replaced sorted NULLS FIRST instead; with
    the documented non-null contract the two never diverge.

    Implemented as a ``min_by`` hash aggregate rather than a row_number
    window: the agg gets map-side partial combine (one candidate row per
    key per mapper before the shuffle) and no per-partition sort — the
    shape that wins at cluster scale.
    """
    other = [c for c in df.columns if c not in keys]
    first = df.groupBy(*keys).agg(
        F.min_by(F.struct(*other), F.col(order_col)).alias("_f")
    )
    # original column order preserved
    return first.select(
        *[c if c in keys else F.col(f"_f.{c}").alias(c) for c in df.columns]
    )


def coerce_amount(
    df: DataFrame, col: str = "amount", precision: int = 10, scale: int = 2
) -> DataFrame:
    """T4: numeric coercion with default-to-zero (main.py:124-125).

    ``try_cast`` maps non-parseable strings to NULL (ANSI-safe), then
    ``coalesce`` with a typed zero reproduces pandas'
    ``to_numeric(errors='coerce').fillna(0)`` — '' / 'N/A' / NULL all → 0.00.
    """
    target = f"decimal({precision},{scale})"
    return df.withColumn(
        col,
        F.coalesce(
            F.col(col).try_cast(target),
            F.lit(0).cast(target),
        ),
    )


def clean_transactions(df: DataFrame) -> DataFrame:
    """The full cleaning stage (main.py:121-126): T2 guard + T3 + T4.

    The empty-frame guard is free in Spark — every step below is a no-op on
    an empty DataFrame, so no ``isEmpty()`` action (an extra job) is spent.
    The sink layer applies the reference's skip-if-empty behavior (K1).
    """
    out = dedup_keep_first(df, ["timestamp", "account_id"])
    out = coerce_amount(out)
    return out.drop("_arrival")
