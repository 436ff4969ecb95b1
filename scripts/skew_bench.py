"""Skewed-corpus bench: the salt path's effect, measured (SURVEY.md §7
hard-part #2; VERDICT round-1 next-step #9).

Builds a corpus with ONE conversation ≥10³× the median turn count (median 4
turns, skewed conversation 50,000), writes it conv-bucketed to /dev/shm —
the layout a conv_id-partitioned Iceberg table would hand the scan, i.e. the
whole monster conversation lands in ONE task — then times the extraction
twice on identical input:

- salt OFF: mapInPandas over the conv-bucketed partitions → the task holding
  the big conversation is the wall (straggler-bound).
- salt ON : extract()'s repartition on (conv_id, pmod(hash(turn_idx), S))
  spreads the big conversation across S partitions → wall tracks total
  work / cores plus one shuffle.

Appends a row per case to stdout as JSON; BENCH.md records the table.

Usage: python scripts/skew_bench.py [--big 50000] [--convs 5000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--big", type=int, default=50000, help="turns in the skewed conv")
    p.add_argument("--convs", type=int, default=5000, help="normal 4-turn convs")
    p.add_argument("--reps", type=int, default=2, help="timed reps per case (best kept)")
    p.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument(
        "--big-kind",
        choices=("mix", "pdf_real"),
        default="mix",
        help="payload kind of the monster conversation: the corpus mix, "
        "or FORCED real-PDF payloads (round-4 verdict item 9 — the "
        "~740 us/turn kernel path is the worst straggler fuel)",
    )
    args = p.parse_args()

    from pyspark.sql import functions as F

    from paddleocr_spark.operators.extract import extract
    from paddleocr_spark.session import get_spark

    spark = get_spark("skew-bench", cores=args.cores)
    sc = spark.sparkContext

    work = "/dev/shm/skew_bench_corpus"
    shutil.rmtree(work, ignore_errors=True)

    # --- corpus: `convs` normal conversations x 4 turns + one monster ------
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    from paddleocr_spark.corpus import payload_for, turn_row

    big_kind = args.big_kind
    big_id = args.convs

    def gen_part(it):
        import random as _rnd

        import pandas as pd

        from paddleocr_spark.corpus import _h, _make_realpdf, conv_id_for

        for pdf in it:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["turn_idx"]):
                row = turn_row(int(d), 0, int(t), words)
                if big_kind == "pdf_real" and int(d) == big_id:
                    # force the monster conversation onto the real-PDF
                    # kernel path (deterministic per turn)
                    row["text"] = _make_realpdf(
                        _rnd.Random(_h(f"{conv_id_for(int(d), 0)}:{int(t)}")),
                        words,
                    )
                rows.append(row)
            yield pd.DataFrame(rows)

    normal = (
        spark.range(args.convs)
        .select(F.col("id").alias("doc_id"))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.lit(3))))
    )
    # the monster conversation reuses doc_id = convs (unique), 50k turns
    big = (
        spark.range(1)
        .select(F.lit(args.convs).alias("doc_id"))
        .withColumn(
            "turn_idx", F.explode(F.sequence(F.lit(0), F.lit(args.big - 1)))
        )
    )
    corpus = (
        normal.unionByName(big)
        .repartition(args.cores * 2, "doc_id", "turn_idx")
        .mapInPandas(
            gen_part,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
    )
    # conv-bucketed layout: the big conversation lands in one file/partition
    corpus.repartition(args.buckets, "conv_id").write.mode("overwrite").parquet(work)
    src = spark.read.parquet(work)
    n_rows = src.count()
    print(
        json.dumps(
            {
                "case": "corpus",
                "rows": n_rows,
                "median_turns": 4,
                "big_turns": args.big,
                "skew_x_median": args.big // 4,
            }
        )
    )

    def timed(salt: bool) -> float:
        best = float("inf")
        for _ in range(args.reps + 1):  # +1 warmup, keep best timed rep
            t0 = time.time()
            out = extract(src, salt=salt)
            n = out.select(F.sum("n_spans")).collect()[0][0]
            dt = time.time() - t0
            best = min(best, dt)
        assert n is not None
        return best

    for salt in (False, True):
        wall = timed(salt)
        print(
            json.dumps(
                {
                    "case": f"salt_{'on' if salt else 'off'}",
                    "wall_s": round(wall, 2),
                    "turns_per_s": int(n_rows / wall),
                    "cores": args.cores,
                }
            )
        )

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
