"""Text column functions (JVM-side, codegen-friendly — no Python UDFs).

Tokenization contract: whitespace split, empty tokens dropped —
matching the reference test workload's ``strings.Fields``
(/root/reference/src/mapreduce/common_test_suite.go:33-41). The same
definition is used by the DuckDB oracles
(``string_split_regex(text, '\\s+')`` + empty filter) so results
hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def tokens(col: Column | str) -> Column:
    """Array of non-empty whitespace-separated tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WHITESPACE), lambda t: t != F.lit(""))


def explode_tokens(df: DataFrame, col: str = "text", out: str = "token") -> DataFrame:
    """1 row per token — the engine-native form of the reference's
    word-splitting mapF (UDTF shape, SURVEY.md §2.2)."""
    return df.select(F.explode(tokens(col)).alias(out))


def distinct_tokens(df: DataFrame, col: str = "text", out: str = "token") -> DataFrame:
    """Distinct tokens, lexicographically sorted (string order —
    the reference's master.go:116 sort.Strings semantics)."""
    return explode_tokens(df, col, out).distinct().orderBy(out)
