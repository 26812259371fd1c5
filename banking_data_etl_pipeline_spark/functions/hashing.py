"""Deterministic, engine-portable hashing primitives.

Everything is built on md5 hex strings: Spark's ``md5`` and DuckDB's
``md5`` produce identical lowercase hex, and because the hex is
fixed-length, *lexicographic* min/comparisons are equivalent to numeric
ones — so MinHash signatures, LSH band keys and fingerprints never need
a hex->int conversion that the two engines would disagree on.

(Spark's ``xxhash64``/``hash`` are Spark-specific and would break the
DuckDB oracle; they remain fine for purely-internal bucketing.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    return F.md5(col.cast("string"))


def salted_md5(col: Column, salt: str) -> Column:
    return F.md5(F.concat(F.lit(salt), col.cast("string")))


def minhash_signature(tokens: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: for each salt i, min over tokens of
    md5('mh{i}:' || token). Null component when the token set is empty.

    One pass per hash over the token array — all inside a single
    projection, no shuffle, no UDF. At 100 TB this is the map-side of
    the dedup; only the band keys shuffle.

    NB: the per-hash salt must be bound via a closure FACTORY — a
    ``lambda t, i=i:`` default arg makes PySpark see a 2-parameter
    lambda and bind ``i`` to transform's array-index column instead.
    """

    def _hasher(i: int):
        salt = f"mh{i}:"
        return lambda t: salted_md5(t, salt)

    return [F.array_min(F.transform(tokens, _hasher(i))) for i in range(num_hashes)]


def band_keys(sig_cols: list[Column], bands: int, rows: int) -> list[Column]:
    """LSH banding: hash each contiguous ``rows``-slice of the signature
    into one band key. The band index is baked into the hash input so
    keys from different bands never collide and the bucket self-join is
    a single-key equi-join. Docs sharing any band key are candidates."""
    assert len(sig_cols) == bands * rows
    return [
        F.md5(F.concat_ws("|", F.lit(f"b{b}"), *sig_cols[b * rows : (b + 1) * rows]))
        for b in range(bands)
    ]


def simhash_bits(tokens: Column, n_bits: int = 32) -> Column:
    """SimHash over the first ``n_bits`` hex digits of each token's md5:
    bit j is the majority vote of (hex_digit_j >= 8) across tokens.
    Returned as a '0'/'1' string (portable; no 64-bit int parsing).

    Each hex digit's top bit is an independent unbiased coin per token,
    which is exactly the SimHash construction with 1-bit projections.
    """
    # hex digit >= '8' <=> top bit set ('0'..'9' < 'a'..'f' in ASCII, so
    # plain string comparison is exact — and portable to the SQL twin).
    # Closure factory, NOT a default-arg lambda: aggregate's merge takes
    # exactly (acc, x), and a default param changes the visible arity.
    def _voter(j: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), j, 1) >= "8", 1
        ).otherwise(-1)

    bits = []
    for j in range(1, n_bits + 1):
        vote = F.aggregate(tokens, F.lit(0), _voter(j))
        bits.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def hamming_distance_bits(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length '0'/'1' strings."""
    pairs = F.zip_with(
        F.split(a, ""),
        F.split(b, ""),
        lambda x, y: F.when(x != y, 1).otherwise(0),
    )
    return F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x)
