"""Shared scalar SQL fragments used across operators.

Each fragment exists in a Spark-SQL and a DuckDB form that compute
IDENTICAL values (the driver compares query results cell-for-cell), so
they live here once instead of drifting apart per module:

- ``TOKENS`` / ``TOKENS_DUCK``: ascii word tokens of ``text`` --
  lowercase split on non-alphanumeric runs, empties dropped.
- ``shingles(k)`` / ``shingles_duck(k)``: word k-grams of those tokens
  (space-joined), the dedup/similarity unit.
- ``h64_duck(col)``: DuckDB md5-derived 60-bit integer hash -- the
  oracle twin of the Column-level ``_h64`` the operators build with
  ``F.conv(F.substring(F.md5(...), 1, 15), 16, 10)``; the only hash
  both engines compute bit-identically.
"""

from __future__ import annotations

TOKENS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
TOKENS_DUCK = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def shingles(k: int = 3, toks: str = TOKENS) -> str:
    """Spark SQL expr: word k-gram strings of the token array."""
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {k}))) "
        "ELSE array() END"
    )


def shingles_duck(k: int = 3, toks: str = TOKENS_DUCK) -> str:
    """DuckDB expr computing the same k-gram strings."""
    return (
        f"list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> array_to_string(({toks})[i:i+{k - 1}], ' '))"
    )


def h64_duck(col: str) -> str:
    """DuckDB md5-hex prefix -> bigint (60 bits, non-negative); twin of
    the operators' Column-level ``_h64``."""
    return f"('0x' || substring(md5({col}), 1, 15))::BIGINT"
