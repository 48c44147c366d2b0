"""Bloom filter: the approximate-MEMBERSHIP sketch (complementing the
engine's HLL distinct, quantile, and freq_items sketches). The scale
role is the LSM/Bigtable pre-filter pattern: build once over a big
"seen" side (keeper fingerprints, benchmark n-grams), broadcast the
bit array (m/8 bytes — fixed, tiny next to the member set itself),
and drop the no-hit majority of a probe BEFORE any join touches the
big side. One-sided error: no false negatives ever (a true member
always hits), false positives at a dialable rate — so using it as a
PRE-filter before an exact join keeps results exact while skipping
the scan when nothing matches.

Spark shape: bit positions are computed JVM-side (xxhash64 under k
seeds, codegen); the build aggregates DISTINCT positions (bounded by
m) and packs bits driver-side; the probe tests bits in an
Arrow-batched pandas UDF over the broadcast array — one numpy gather
per batch, no per-row Python. At truly huge member sets swap the
position-collect for a treeAggregate of byte chunks; the probe is
unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = -n·ln(p)/ln2², k = (m/n)·ln2 (≥1)."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1 (got {n_items})")
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1) (got {fpp})")
    m = max(8, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _positions(col: Column, m: int, k: int) -> Column:
    """array<long> of k bit positions for a value — pure JVM codegen."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m)) for seed in range(k)]
    )


def insert_positions(bits: "np.ndarray", P: "np.ndarray") -> None:
    """Set the bits for position array P in place. MUST be
    np.bitwise_or.at, not `bits[idx] |= mask`: fancy-index in-place OR
    applies ONE write per duplicate index, so two positions landing in
    the same byte would silently drop a bit — a false negative on that
    value's later duplicates (regression-pinned in tests)."""
    np.bitwise_or.at(bits, P >> 3, (1 << (P & 7)).astype(np.uint8))


def test_positions(bits: "np.ndarray", P: "np.ndarray") -> "np.ndarray":
    """Row-wise might-contain over a (rows, k) position matrix (or a
    single (k,) vector) against a packed bit array."""
    hit = bits[P >> 3] & (1 << (P & 7)).astype(np.uint8)
    return (hit != 0).all(axis=-1)


def build_bloom(
    df: DataFrame, col: str, n_items: int | None = None, fpp: float = 0.01
) -> dict:
    """Build a Bloom filter over a column's DISTINCT values. Returns a
    plain dict {bits: np.uint8 array, m, k} — broadcastable by closure
    capture, persistable via bits.tobytes().

    ``n_items`` sizes the filter; when omitted it costs one
    countDistinct pass (pass it explicitly when the caller already
    knows the cardinality). The build shuffle moves DISTINCT bit
    positions only — bounded by m regardless of input size."""
    if n_items is None:
        n_items = df.select(col).distinct().count()
    m, k = bloom_params(max(n_items, 1), fpp)
    pos = (
        df.select(F.explode(_positions(F.col(col), m, k)).alias("p"))
        .distinct()
        .collect()  # ≤ m rows by construction — the bit array itself
    )
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    idx = np.fromiter((r.p for r in pos), dtype=np.int64, count=len(pos))
    insert_positions(bits, idx)
    return {"bits": bits, "m": m, "k": k}


def might_contain(bloom: dict, col: Column) -> Column:
    """Boolean column: True if ``col``'s value MIGHT be in the filter
    (always True for true members; false-positive at the build fpp).
    JVM computes the k positions; an Arrow-batched UDF tests the
    broadcast bit array with one numpy gather per batch."""
    bits, k = bloom["bits"], bloom["k"]

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        if not len(pos):
            return pd.Series([], dtype=bool)
        P = np.stack(pos.to_numpy()).astype(np.int64)  # (rows, k)
        return pd.Series(test_positions(bits, P))

    return _test(_positions(col, bloom["m"], k))


def bloom_prefilter(
    probe: DataFrame, bloom: dict, col: str, keep_hits: bool = True
) -> DataFrame:
    """Keep only probe rows whose ``col`` might be (keep_hits=True) or
    definitely is NOT (keep_hits=False) in the filter — the pre-join
    gate: `bloom_prefilter(batch, seen_bloom, "fp")` shrinks the batch
    to possible duplicates before the exact seen-probe join runs, and
    `keep_hits=False` admits definite-new rows with NO join at all
    (exactness guaranteed by the no-false-negative side)."""
    hit = might_contain(bloom, F.col(col))
    return probe.where(hit if keep_hits else ~hit)
