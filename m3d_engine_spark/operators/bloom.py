"""Explicit Bloom filter build/probe as DataFrame relations.

Beyond-reference capability, and the in-engine answer to a probed env
gap: this Spark build does not expose ``bloom_filter_agg`` /
``might_contain`` as public routines (BASELINE.md round-6 probe), and
the runtime row-level bloom injection only fires where Catalyst
chooses. This module gets the same pre-join pruning effect with plain
relational algebra, so it works on ANY Spark (and its md5 hashing is
engine-exact, so DuckDB can replay it bit for bit):

* build — each key sets ``k`` md5-derived bit positions in an
  ``m``-bit filter; positions pack into 63-bit words via ``bit_or``
  (bit 63 stays unused: a ``1 << 63`` overflows DuckDB's BIGINT and
  wraps in Java — 63 bits sidesteps both). The result is a relation
  of ``ceil(m/63)`` rows — ~2 MB of longs for m = 10⁹ bits, a
  broadcast no matter how many keys went in. That is the whole point
  vs broadcasting the keys themselves: the filter size is FIXED by
  (m, k), not by key cardinality.
* probe — each candidate fans out to its k (word, mask) probes, ONE
  broadcast join against the filter words, and passes only if every
  probe bit is set (``min(hit) = 1``). No-false-negative guarantee:
  a key that was built in always passes; false positives at the
  textbook ``(1 − e^(−k·n/m))^k`` rate just mean the expensive exact
  join downstream sees a few extra rows.

The 100 TB use: semi-join pruning of a huge fact scan against a
selective dimension WITHOUT shuffling the fact — build on the dim
(tiny job), broadcast the words, drop non-matching fact rows
map-side, then do the exact join on survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 63


def _positions(key, m_bits: int, k: int):
    """k md5-derived bit positions of ``key`` (engine-exact)."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(int(m_bits)),
        )
        for j in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the filter relation ``(word long, bits long)`` from the
    distinct values of ``key_col``. One map-side-combinable ``bit_or``
    aggregate; the exchange carries ≤ ceil(m/63) rows per task."""
    if m_bits <= 0 or k <= 0:
        raise ValueError("m_bits and k must be positive")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("_pos")
    return (
        df.filter(key.isNotNull())
        .select(pos)
        .select(
            F.expr(f"_pos div {_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_WORD_BITS} AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Append ``maybe`` (1 = possibly in the built set, 0 = definitely
    not) to ``df``. (m_bits, k) must match the build.

    Scale form: k consecutive BROADCAST joins of the (tiny) word
    relation — the probed side is never shuffled, never exploded,
    never re-joined to itself; ``maybe`` is a map-side AND of the k
    bit tests, so this composes as a pure pre-filter in front of the
    exact join it protects. Rows with NULL keys probe to 0."""
    key = F.col(key_col)
    cols = list(df.columns)
    if "maybe" in cols:
        raise ValueError(
            "bloom_probe appends a 'maybe' column; rename the existing one"
        )
    # Temp/join column names must not clobber user data: derive a
    # prefix no existing column starts with (a df already carrying
    # `_pos`/`_w0`/… would otherwise lose it in the intermediate
    # projections).
    pre = "_bp"
    while any(c.startswith(pre) for c in cols):
        pre += "x"
    # The filter relation is referenced once per hash; without a
    # checkpoint each broadcast branch re-executes the whole build
    # subtree (measured 6× slower at sf0.01). It is ≤ ceil(m/63) rows
    # — materializing it is the cheap side of the trade by design.
    bloom = bloom.localCheckpoint(eager=True)
    out = df
    hit_cols = []
    for j, pos in enumerate(_positions(key, m_bits, k)):
        out = (
            out.withColumn(f"{pre}pos", pos)
            .withColumn(f"{pre}w{j}", F.expr(f"`{pre}pos` div {_WORD_BITS}"))
            .withColumn(
                f"{pre}m{j}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(`{pre}pos` % {_WORD_BITS} AS INT))"
                ),
            )
            .drop(f"{pre}pos")
        )
        bl = bloom.select(
            F.col("word").alias(f"{pre}bw{j}"),
            F.col("bits").alias(f"{pre}bb{j}"),
        )
        out = out.join(
            F.broadcast(bl), F.col(f"{pre}w{j}") == F.col(f"{pre}bw{j}"), "left"
        )
        hit_cols.append(
            F.coalesce(  # NULL key -> NULL mask -> probe to 0, not NULL
                (
                    F.coalesce(F.col(f"{pre}bb{j}"), F.lit(0)).bitwiseAND(
                        F.col(f"{pre}m{j}")
                    )
                    != 0
                ).cast("int"),
                F.lit(0),
            )
        )
    maybe = hit_cols[0]
    for h in hit_cols[1:]:
        maybe = maybe * h
    return out.withColumn("maybe", maybe.cast("int")).select(*cols, "maybe")
