"""Explicit StructType schemas.

The reference declares types only at its sink (`/root/reference/main.py:141-170`,
the ``dtype_mapping`` dicts); here every table has an explicit schema applied
at *read* time — schema-on-read inference is banned in production paths
(SURVEY.md §1.2). At 100 TB an inferred schema is a full extra pass over the
data and a correctness hazard; explicit StructTypes also let the vectorized
parquet reader prune columns eagerly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Family A — reference-shaped tables (cf. /root/reference/main.py:141-170)
# ---------------------------------------------------------------------------

# accounts: main.py:141-144
ACCOUNTS = T.StructType(
    [
        T.StructField("account_id", T.LongType(), False),
        T.StructField("client_id", T.StringType(), True),  # VARCHAR(50) at JDBC sink
    ]
)

# clients: main.py:151-156
CLIENTS = T.StructType(
    [
        T.StructField("client_id", T.StringType(), False),
        T.StructField("client_name", T.StringType(), True),
        T.StructField("client_email", T.StringType(), True),
        T.StructField("client_birth_date", T.DateType(), True),
    ]
)

# transactions as they arrive from the paginated JSON feed: `amount` is a raw
# string (may be garbage / null) until the T4 coercion step (main.py:124-125).
TRANSACTIONS_RAW = T.StructType(
    [
        # nullable: the feed is allowed to contain garbage/missing ids
        # (the reference tolerates them as pandas NaN); the sink's DDL
        # types, not ingest, are the contract (main.py:163-170)
        T.StructField("transaction_id", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("account_id", T.LongType(), True),
        T.StructField("amount", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("medium", T.StringType(), True),
        # arrival ordinal attached at ingest (page*limit + in-page index) so
        # keep-first dedup (T3) is deterministic across partitions; the
        # reference gets this implicitly from pandas row order (main.py:123).
        T.StructField("_arrival", T.LongType(), True),
    ]
)

# transactions after cleaning: amount is DECIMAL(10,2) (main.py:167).
TRANSACTIONS = T.StructType(
    [
        T.StructField("transaction_id", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("account_id", T.LongType(), True),
        T.StructField("amount", T.DecimalType(10, 2), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("medium", T.StringType(), True),
    ]
)

# JDBC sink column types (K2-K4), mirroring main.py:141-170 exactly.
JDBC_COLUMN_TYPES = {
    "accounts": "account_id BIGINT, client_id VARCHAR(50)",
    "clients": (
        "client_id VARCHAR(50), client_name VARCHAR(50), "
        "client_email VARCHAR(40), client_birth_date DATE"
    ),
    "transactions": (
        "transaction_id BIGINT, timestamp TIMESTAMP, account_id BIGINT, "
        "amount DECIMAL(10,2), type VARCHAR(5), medium VARCHAR(10)"
    ),
}

# ---------------------------------------------------------------------------
# Family B — driver corpus /root/testdata/sf*/ (FIXTURES.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

# Fallback schema for an events fixture whose ts is TIMESTAMP(NANOS,false)
# (Spark's parquet reader rejects NANOS as a timestamp) or a raw int64.
# catalog.load_table sniffs the parquet footer and only uses this path —
# spark.sql.legacy.parquet.nanosAsLong + timestamp_micros(ts div 1000) —
# when needed; standard units (us/ms/s) read natively via EVENTS.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch nanos
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON string
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
