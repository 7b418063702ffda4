"""Reusable scalar/column expression library.

Every builder here returns a JVM-side Catalyst ``Column`` (no Python UDFs)
and is *cross-engine deterministic*: the same expression has a documented
DuckDB-SQL equivalent producing bit-identical values, so any query built
from these primitives can be differentially tested against the oracle.
"""

from .scalars import md5_int64, money_cents, stable_bucket, ws_tokens

__all__ = ["md5_int64", "money_cents", "stable_bucket", "ws_tokens"]
