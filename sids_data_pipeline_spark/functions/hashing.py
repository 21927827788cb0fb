"""Portable deterministic hashing for dedup/LSH operators.

The engine's near-duplicate operators (MinHash, SimHash) need hash
functions that are (a) stable across runs/partitionings — so results are
reproducible under AQE re-planning at 100 TB — and (b) reproducible in
ANSI SQL, so the DuckDB correctness oracle can verify the *full* LSH
pipeline value-for-value rather than falling back to a rows-only check.

``token_hash32`` is the base hash: the first 8 hex digits of md5,
interpreted as an unsigned 32-bit integer. md5 is available and
bit-identical in Spark (``F.md5``) and DuckDB (``md5``), unlike either
engine's native ``hash()``. MinHash permutations are the classic
universal family ``h_i(x) = (a_i * x + b_i) mod P`` with P prime > 2^32
and small fixed odd multipliers, keeping every intermediate < 2^48 (no
BIGINT overflow in either engine).

The reference has no hashing layer — its dedup story is file-existence
checks (reference ``pipeline/processing/data.py:26-40``); this module is
part of the mandated EXT surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime just above 2^32 (classic MinHash modulus).
MINHASH_PRIME = 4_294_967_311

# Fixed (a, b) permutation parameters; a < 2^16 keeps a*h < 2^48.
MINHASH_PARAMS: tuple[tuple[int, int], ...] = (
    (2971, 433),
    (6361, 1543),
    (9923, 2741),
    (14533, 4391),
    (19489, 5801),
    (24697, 7121),
    (31469, 8677),
    (38921, 9791),
    (45481, 11273),
    (51407, 12893),
    (57557, 14437),
    (63377, 15913),
)


def token_hash32(col: Column | str) -> Column:
    """Unsigned 32-bit hash of a string: first 8 md5 hex digits as BIGINT.

    SQL twin: ``('0x' || substr(md5(x), 1, 8))::BIGINT`` (DuckDB).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def o_token_hash32(expr: str) -> str:
    """DuckDB SQL twin of :func:`token_hash32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_col(hash_col: Column | str, i: int) -> Column:
    """i-th MinHash permutation of a 32-bit hash column."""
    if not 0 <= i < len(MINHASH_PARAMS):
        raise ValueError(
            f"minhash permutation {i} out of range: {len(MINHASH_PARAMS)} "
            "fixed (a, b) parameter pairs are defined (MINHASH_PARAMS); "
            "extend the table to raise num_hashes"
        )
    a, b = MINHASH_PARAMS[i]
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return (c * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def o_minhash(expr: str, i: int) -> str:
    """DuckDB SQL twin of :func:`minhash_col`."""
    a, b = MINHASH_PARAMS[i]
    return f"(({expr}) * {a} + {b}) % {MINHASH_PRIME}"
