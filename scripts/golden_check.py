"""Full-corpus golden-equality check at any scale factor.

The driver's correctness gate runs at sf0.01; this script runs the same
golden comparison (engine extraction vs the frozen pure-Python-oracle
relation) over EVERY turn of any sf dir — the TIPC golden-compare at scale.

Usage: python scripts/golden_check.py [sf_dir]   (default sf0.1)
Round-2 recorded result: sf0.1 — 40,592/40,592 turns byte-equal, 0 mismatches.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from paddleocr_spark.golden import ensure_golden
    from paddleocr_spark.plans import flagship
    from paddleocr_spark.session import get_spark

    t0 = time.time()
    g = ensure_golden(sf_dir)
    print(f"golden ready in {time.time() - t0:.1f}s: {g}")
    spark = get_spark("golden-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = flagship(spark, sf_dir, ordered=False).select(
        "conv_id", "turn_idx", "payload_kind", "n_spans", "extracted_text"
    )
    gold = spark.read.parquet(f"{g}/extract.parquet").select(
        "conv_id",
        "turn_idx",
        F.col("payload_kind").alias("g_kind"),
        F.col("n_spans").alias("g_n"),
        F.col("extracted_text").alias("g_text"),
    )
    j = out.join(gold, ["conv_id", "turn_idx"], "full_outer")
    n = j.count()
    bad = j.filter(
        (F.col("payload_kind") != F.col("g_kind"))
        | (F.col("n_spans").cast("long") != F.col("g_n"))
        | (F.col("extracted_text") != F.col("g_text"))
        | F.col("g_text").isNull()
        | F.col("extracted_text").isNull()
    ).count()
    print(f"turns compared: {n}, mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
