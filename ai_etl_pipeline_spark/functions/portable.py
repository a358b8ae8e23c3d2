"""Portable deterministic hash/token primitives.

Dedup and fingerprint operators need hashes that (a) are stable across
runs/cluster layouts and (b) can be reproduced by the DuckDB oracle SQL
used in correctness checks. ``xxhash64``/``hash`` are Spark-private, so
the portable base is md5 (identical bytes on every engine):

    md5_i64(x)  =  int(hex(md5(x))[0:15], 16)        -- 60 bits, positive

Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: bigint
DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

"Permutation" i of a MinHash family is md5 over a salted input
(``i || '|' || token``) — k independent-enough hash functions with zero
engine-specific code, usable verbatim in oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_i64(col: Column) -> Column:
    """Deterministic 60-bit positive int hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_i64_sql(expr: str) -> str:
    """DuckDB rendering of the same hash (for oracle SQL builders)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def tokens_col(text: Column, lowercase: bool = True, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization → array<string>, empties removed."""
    t = F.lower(text) if lowercase else text
    arr = F.split(F.trim(t), pattern)
    return F.filter(arr, lambda x: x != "")


def minhash_signature_cols(token_col_name: str, num_hashes: int) -> list[Column]:
    """MinHash over an exploded token column: for permutation i, the
    signature component is ``min(md5_i64(i || '|' || token))``. Use after
    ``explode`` + ``groupBy(doc)`` as aggregate expressions."""
    return [
        F.min(md5_i64(F.concat(F.lit(f"{i}|"), F.col(token_col_name)))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
