"""Portable deterministic hash/token primitives.

Dedup and fingerprint operators need hashes that (a) are stable across
runs/cluster layouts and (b) can be reproduced by the DuckDB oracle SQL
used in correctness checks. ``xxhash64``/``hash`` are Spark-private, so
the portable base is md5 (identical bytes on every engine):

    md5_i64(x)  =  int(hex(md5(x))[0:15], 16)        -- 60 bits, positive

Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: bigint
DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

"Permutation" i of a MinHash family is the Carter-Wegman affine map
``(a_i * h + b_i) mod p`` over ``h = md5_i64(token) mod p`` with fixed
per-permutation constants (themselves derived from md5, so both engines
embed the same literals): ONE md5 kernel per item generates all k
permutations, and pairwise independence holds per permutation — unlike
the superficially similar ``(h1 + i*h2) mod p`` double-hashing trick,
whose permutations are correlated (consecutive i differ by the small
constant h2, so one item tends to win the min for MANY i, which
destroys the E[matches]/k ≈ Jaccard estimate).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_PRIME = 2147483647  # 2^31 - 1; (p-1)^2 + (p-1) < 2^63, no overflow


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


def cw_coefficients(prefix: str, n: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) Carter-Wegman constants, a_i ∈ [1, p-1],
    b_i ∈ [0, p-1]. Derived from md5 of ``{prefix}-a/b-{i}`` so the same
    literals can be embedded in Spark plans and oracle SQL alike; each
    family (minhash, bootstrap, …) picks its own prefix."""
    p = MINHASH_PRIME
    coeffs = []
    for i in range(n):
        a = int(hashlib.md5(f"{prefix}-a-{i}".encode()).hexdigest()[:15], 16) % (p - 1) + 1
        b = int(hashlib.md5(f"{prefix}-b-{i}".encode()).hexdigest()[:15], 16) % p
        coeffs.append((a, b))
    return coeffs


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """The MinHash family's constants (prefix ``mh`` — unchanged since
    round 3; every committed signature depends on these literals)."""
    return cw_coefficients("mh", num_hashes)


def minhash_signature_cols(token_col_name: str, num_hashes: int) -> list[Column]:
    """MinHash aggregate expressions over an exploded token column:
    permutation i is ``min((a_i * (md5_i64(tok) mod p) + b_i) mod p)``.
    One md5 per item; the k affine maps are pairwise independent."""
    h = md5_i64(F.col(token_col_name)) % F.lit(MINHASH_PRIME)
    return [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coefficients(num_hashes))
    ]


def md5_i64_py(value: str) -> int:
    """Driver-side rendering of :func:`md5_i64` — same 60-bit integer for
    the same string, for code that orders a tiny collected sample the
    way the engines order it (e.g. k-means centroid init)."""
    return int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
