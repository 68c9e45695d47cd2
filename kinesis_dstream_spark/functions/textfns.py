"""Text helpers shared by the dedup / text-analysis operators.

All builders return Column expressions (JVM-side); nothing here executes
Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus (1e9+7, a 30-bit prime) + base for polynomial rolling hashes.
# Residues stay < 2^30, so base*residue+char products stay well within
# int64 with no overflow; Spark and DuckDB both evaluate the fold
# left-to-right with 64-bit ints, so the fingerprints are bit-identical
# across engines.
FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column) -> Column:
    """Whitespace tokenization (collapses runs of whitespace)."""
    return F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")


def word_shingles(toks: Column, k: int = 3, distinct: bool = True) -> Column:
    """k-word shingles of a token array (native, no UDF).

    Built as k-1 pairwise ``zip_with`` concats over shifted slices of the
    token array — O(n·k) string concats total. (The obvious
    ``transform(starts, i -> concat_ws(slice(toks, i, k)))`` allocates a
    fresh k-array per position inside an interpreted lambda and measured
    ~2x slower at bench scale.) Documents shorter than k tokens produce a
    single whole-document shingle so they still participate in dedup.

    ``distinct=False`` keeps one shingle per POSITION (needed when the
    consumer counts duplicated spans, not set overlap).
    """
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(1))  # number of shingles
    acc = F.slice(toks, 1, m)
    for j in range(2, k + 1):
        nxt = F.slice(toks, j, m)
        acc = F.zip_with(acc, nxt, lambda x, y: F.concat(x, F.lit(" "), y))
    shingled = F.when(n >= k, acc).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(shingled) if distinct else shingled


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash of the character stream (native fold).

    fp = fold(chars, 0, (acc, c) -> (acc * 31 + ascii(c)) mod 1e9+7).
    Deterministic, engine-portable (same fold exists in DuckDB as
    list_reduce), and cheap — one pass per row inside the JVM.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


def md5_bits32(token: Column) -> Column:
    """Stable 32-bit integer hash of a token via md5 (engine-portable).

    ``conv(hex, 16, 10)`` on the first 8 md5 hex chars — reproducible in
    DuckDB as ``('0x' || substr(md5(t),1,8))::BIGINT``, which is what makes
    SimHash oracle-checkable. md5 is ~3x slower than murmur3 but identical
    across engines; the dedicated non-oracle paths use F.hash/xxhash64.
    """
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
