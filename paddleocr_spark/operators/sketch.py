"""Deterministic streaming sketches: HyperLogLog registers + count-min.

Corpus-analytics layer at 100 TB: exact distinct counts and exact token
frequencies need a full shuffle on the key; sketches replace that with a
FIXED-SIZE mergeable state (64 longs for HLL, 4×1024 longs for count-min)
built by one map-side-combinable aggregation — the shape that survives any
scale because the reduce side is O(sketch), not O(keys). Spark's built-in
``approx_count_distinct`` is the same idea but its register layout is
engine-private; these sketches are built from md5 bits with string/integer
ops only, so DuckDB reproduces them bit-for-bit and the driver's exact
value-hash check applies to an *approximate* structure.

Reference analog: the reference accumulates fixed-size eval state (hist
buckets / confusion counts) per batch and merges across batches
(/root/reference/ppocr/metrics/det_metric.py:58-94 result accumulation);
these are the corpus-scale equivalents.

Determinism notes:
- rho (HLL leading-zero rank) is computed by HEX-STRING scanning — count of
  leading '0' hex digits ×4 plus a 16-case digit table — no log2/bit_length
  builtins (not portable / not correctly rounded).
- registers are capped at RHO_CAP=40 (P[rho>40] ≈ 2^-40; standard HLL stores
  6-bit registers anyway) so the folded power sum Σ 2^(40−Mj) stays far
  inside int64 for any register state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

HLL_B = 6  # 2^6 = 64 buckets
HLL_M = 1 << HLL_B
RHO_CAP = 40
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007)

CM_DEPTH = 4
CM_WIDTH = 1024

# zeros contributed by the first non-zero hex digit
_HEX_ZEROS = {
    "1": 3, "2": 2, "3": 2,
    "4": 1, "5": 1, "6": 1, "7": 1,
    "8": 0, "9": 0, "a": 0, "b": 0, "c": 0,
    "d": 0, "e": 0, "f": 0,
}


def _digit_zeros(d):
    out = F.lit(0).cast("long")
    for digit, z in _HEX_ZEROS.items():
        out = F.when(d == digit, F.lit(z).cast("long")).otherwise(out)
    return out


def _rho(hexsub, n_digits: int):
    """HLL rank: leading zero BITS of the n_digits-hex-digit value, +1 —
    via string scan (portable, exact)."""
    lead = F.length(F.regexp_extract(hexsub, "^(0*)", 1))
    rest = F.regexp_replace(hexsub, "^0*", "")
    first = F.substring(rest, 1, 1)
    return F.least(
        F.when(
            F.length(rest) == 0, F.lit(4 * n_digits + 1).cast("long")
        ).otherwise(lead * 4 + _digit_zeros(first) + 1),
        F.lit(RHO_CAP).cast("long"),
    )


def hll_registers(df: DataFrame, col) -> DataFrame:
    """64-bucket HLL register relation (bucket, register) over the values of
    ``col``. One shuffle of ≤64 groups (map-side combinable max); registers
    merge across shards/streams with max — the mergeability IS the operator.
    """
    h = F.md5(col)
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % HLL_M
    rho = _rho(F.substring(h, 3, 14), 14)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_summary(df: DataFrame, col) -> DataFrame:
    """One-row HLL summary: (hll_buckets_used, hll_sum_scaled, hll_est).

    hll_sum_scaled = Σ_buckets 2^(40−Mj) with Mj=0 for empty buckets — the
    integer form of the HLL power sum (Σ 2^−Mj scaled by 2^40).
    hll_est = floor(alpha·m²·2^40 / sum): the raw HLL estimate, one double
    divide + floor (the literal numerator is injected via repr on both
    engines)."""
    regs = hll_registers(df, col)
    numer = HLL_ALPHA * HLL_M * HLL_M * float(1 << RHO_CAP)
    empty = (HLL_M - F.count(F.lit(1))) * F.lit(1 << RHO_CAP).cast("long")
    # SQL-form shiftleft: the Python F.shiftleft only takes a literal count
    present = F.sum(
        F.expr(f"shiftleft(cast(1 as bigint), cast({RHO_CAP} - register as int))")
    )
    return regs.agg(
        F.count(F.lit(1)).cast("long").alias("hll_buckets_used"),
        (present + empty).cast("long").alias("hll_sum_scaled"),
    ).select(
        "hll_buckets_used",
        "hll_sum_scaled",
        F.floor(F.lit(numer) / F.col("hll_sum_scaled").cast("double"))
        .cast("long")
        .alias("hll_est"),
    )


BLOOM_BITS = 1 << 16  # m = 65536 bits
BLOOM_WORD = 32  # 32-bit words: masks stay far from the int64 sign bit
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD
BLOOM_K = 4


def _bloom_positions(col):
    """Array of BLOOM_K bit positions for a value column (md5-salted)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bloom{j}:"), col)), 1, 8),
                16,
                10,
            ).cast("long")
            % BLOOM_BITS
            for j in range(BLOOM_K)
        ]
    )


def bloom_build(df: DataFrame, col) -> DataFrame:
    """Bloom-filter bitmap over the values of ``col`` as a (word, bits)
    relation (≤ 2048 rows of 32-bit words) — the fixed-size mergeable
    summary that lets a 100 TB run answer "was this document in yesterday's
    corpus?" WITHOUT joining yesterday's corpus: bitmaps or-merge across
    shards and runs, and the whole filter broadcasts (8 KiB).

    One explode (×K rows) + one groupBy of ≤ BLOOM_WORDS groups
    (map-side-combinable bit_or)."""
    pos = F.explode(_bloom_positions(col)).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
            (F.col("pos") % BLOOM_WORD).alias("bit"),
        )
        .select(
            "word",
            F.expr("shiftleft(cast(1 as bigint), cast(bit as int))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(df: DataFrame, col, bloom: DataFrame, out: str = "bloom_hit") -> DataFrame:
    """Membership verdict per input row: 1 iff ALL K bits of ``col`` are set
    in ``bloom`` (no false negatives; false positives at the standard
    (K·n/m)^K rate). The bloom side is broadcast; the probe is a K-row
    explode + equi-join + all-bits groupBy — never a join against the
    reference corpus itself.

    ``df``'s rows must be distinct (the verdict re-groups by all of ``df``'s
    columns): probe a keyed projection like (doc_id, fp), not raw text."""
    keyed = df.select(
        "*", F.posexplode(_bloom_positions(col)).alias("_j", "_pos")
    ).select(
        *df.columns,
        "_j",
        (F.col("_pos") / BLOOM_WORD).cast("long").alias("word"),
        (F.col("_pos") % BLOOM_WORD).cast("int").alias("bit"),
    )
    probed = keyed.join(F.broadcast(bloom), "word", "left").withColumn(
        "_hit",
        F.when(
            F.expr("(shiftright(coalesce(bits, 0L), bit) & 1) = 1"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return probed.groupBy(*df.columns).agg(F.min("_hit").alias(out))


def bloom_hit_lit(col, bloom: DataFrame):
    """Membership verdict as a pure projection Column (1 iff all K bits set).

    The bitmap relation is collected (≤ BLOOM_WORDS = 2048 words, 8 KiB —
    driver-sized by construction, the whole point of the sketch) and embedded
    as an array LITERAL, so probing a 100 TB scan against yesterday's corpus
    is zero-join, zero-shuffle, zero-Python: K getbit lookups inside the
    scan's projection, fully inside whole-stage codegen. ``bloom_probe``
    remains for bitmap relations kept distributed (e.g. mid-plan builds)."""
    words = [0] * BLOOM_WORDS
    for r in bloom.collect():
        words[int(r["word"])] = int(r["bits"])
    arr = F.lit(words)
    return F.forall(
        _bloom_positions(col),
        lambda p: F.getbit(
            F.element_at(arr, (p / BLOOM_WORD).cast("int") + 1),
            (p % BLOOM_WORD).cast("int"),
        )
        == 1,
    ).cast("int")


def _cm_bucket_col(tok, j: int):
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), tok)), 1, 8), 16, 10)
        .cast("long")
        % CM_WIDTH
    )


def cm_bucket_literal(token: str, j: int) -> int:
    """The same bucket as _cm_bucket_col, computed driver-side for literal
    probe tokens (md5 is a pure function — the constant is identical in any
    engine, same pattern as the literal LSH hyperplanes)."""
    h = hashlib.md5(f"{j}:{token}".encode()).hexdigest()
    return int(h[:8], 16) % CM_WIDTH


def cm_sketch(df: DataFrame, tok_col) -> DataFrame:
    """Count-min sketch relation (j, bucket, c) over a token column:
    CM_DEPTH hash rows × CM_WIDTH buckets. One posexplode (×4 rows) + one
    groupBy of ≤4096 groups — fixed-size mergeable state (counts add)."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                _cm_bucket_col(tok_col, j).alias("bucket"),
            )
            for j in range(CM_DEPTH)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .select("r.j", "r.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(sketch: DataFrame, token: str):
    """Point-frequency estimate for a literal token: min over the sketch's
    CM_DEPTH counters at the token's buckets (an upper bound on the true
    count). A (j, bucket) row absent from the sketch relation means that
    counter is ZERO, so each depth lookup coalesces to 0 before the min —
    otherwise an unseen/rare probe token's estimate would be inflated to the
    min over only the *present* rows (or NULL if all four are absent),
    deviating from count-min semantics. Returns a 1-row DataFrame (cm_est)."""
    per_depth = []
    for j in range(CM_DEPTH):
        b = cm_bucket_literal(token, j)
        per_depth.append(
            F.coalesce(
                F.min(
                    F.when(
                        (F.col("j") == j) & (F.col("bucket") == b), F.col("c")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"_d{j}")
        )
    return sketch.agg(*per_depth).select(
        F.least(*[F.col(f"_d{j}") for j in range(CM_DEPTH)]).alias("cm_est")
    )
