"""zylyty_data_engineer_challenge_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the ZYLYTY Data Engineering challenge reference
(``CadirDev/ZYLYTY-Data-Engineer-Challenge``): authenticated HTTP ingestion
(CSV + paginated JSON), cleaning (keep-first dedup, numeric coercion with
default-to-zero), typed JDBC loading, and the three analytical views —
plus scale-oriented LLM-data-pipeline operators (exact/near dedup,
embedding similarity search, text analysis, multimodal plumbing, streaming
window aggregates).

Everything is expressed with the DataFrame / Spark SQL API so Catalyst and
Tungsten choose the physical strategy; Python UDFs appear only where the
built-in operators genuinely can't express the semantics (Arrow-batched
Pandas UDFs, never row-at-a-time).
"""

__version__ = "0.1.0"
