"""Spatial join + geometric metric operators.

Reference parity (SURVEY.md §2.3, §2.4):

- ``spatial_semi_join``  ← `_filter_text_res` / `_has_intersection`
  (/root/reference/ppstructure/predict_system.py:255-271): keep line boxes
  that rectangle-intersect any region box *of the same page/turn*. Expressed
  as an equi-join on the page key with a range residual — hash-partitions
  cleanly, so it scales as a plain shuffle join (AQE skew-splittable), never
  a cross product.
- ``iou`` / ``det_match_metric``  ← DetectionIoUEvaluator
  (/root/reference/ppocr/metrics/det_metric.py:24-71,
  /root/reference/ppocr/metrics/eval_det_iou.py): greedy one-to-one matching
  of predicted to ground-truth boxes at IoU ≥ 0.5, micro precision/recall/
  hmean. The greedy order is made deterministic by (gt_id, pred_id) ordering;
  ratios are emitted in floored micro-units (exact cross-engine equality).

Boxes are plain integer columns (x0, y0, x1, y1) — intervals are inclusive of
x0/y0, exclusive of x1/y1; all areas integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def spatial_semi_join(
    lines: DataFrame,
    regions: DataFrame,
    keys: list[str] = ("page_id",),
) -> DataFrame:
    """Rows of ``lines`` whose box intersects ANY ``regions`` box with the
    same key tuple. Both inputs need integer columns x0,y0,x1,y1."""
    cond = None
    for k in keys:
        c = lines[k] == regions[k]
        cond = c if cond is None else (cond & c)
    overlap = (
        (lines["x0"] < regions["x1"])
        & (lines["x1"] > regions["x0"])
        & (lines["y0"] < regions["y1"])
        & (lines["y1"] > regions["y0"])
    )
    return lines.join(regions, cond & overlap, "left_semi")


def _inter_area(a_prefix: str, b_prefix: str):
    ax0, ay0, ax1, ay1 = (F.col(f"{a_prefix}{c}") for c in ("x0", "y0", "x1", "y1"))
    bx0, by0, bx1, by1 = (F.col(f"{b_prefix}{c}") for c in ("x0", "y0", "x1", "y1"))
    iw = F.greatest(F.least(ax1, bx1) - F.greatest(ax0, bx0), F.lit(0))
    ih = F.greatest(F.least(ay1, by1) - F.greatest(ay0, by0), F.lit(0))
    return iw * ih


def iou_micro(a_prefix: str = "a_", b_prefix: str = "b_"):
    """floor(1e6 · IoU) between two integer boxes (column expression)."""
    inter = _inter_area(a_prefix, b_prefix)
    area = lambda p: (F.col(f"{p}x1") - F.col(f"{p}x0")) * (
        F.col(f"{p}y1") - F.col(f"{p}y0")
    )
    union = area(a_prefix) + area(b_prefix) - inter
    return F.floor(F.lit(1000000.0) * inter / union).cast("long")


def det_match_pairs(
    gt: DataFrame, pred: DataFrame, min_iou_micro: int = 500000
) -> DataFrame:
    """One-to-one (gt_id → best pred) matching at IoU ≥ threshold.

    Join on page_id, score IoU, then keep each gt's best pred (max IoU,
    pred_id tiebreak) and drop preds claimed by an earlier gt — the
    deterministic analog of the evaluator's greedy loop
    (/root/reference/ppocr/metrics/eval_det_iou.py)."""
    g = gt.select(
        "page_id",
        F.col("box_id").alias("gt_id"),
        *[F.col(c).alias(f"a_{c}") for c in ("x0", "y0", "x1", "y1")],
    )
    p = pred.select(
        "page_id",
        F.col("box_id").alias("pred_id"),
        *[F.col(c).alias(f"b_{c}") for c in ("x0", "y0", "x1", "y1")],
    )
    scored = (
        g.join(p, "page_id")
        .withColumn("iou_micro", iou_micro())
        .filter(F.col("iou_micro") >= min_iou_micro)
        .select("page_id", "gt_id", "pred_id", "iou_micro")
    )
    best_for_gt = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("page_id", "gt_id").orderBy(
                    F.col("iou_micro").desc(), F.col("pred_id").asc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    # a pred claimed by several gts goes to the lowest gt_id (deterministic)
    return (
        best_for_gt.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("page_id", "pred_id").orderBy(F.col("gt_id").asc())
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def det_metric(gt: DataFrame, pred: DataFrame) -> DataFrame:
    """Micro precision/recall/hmean in floored micro-units (single row).

    Fully lazy: three 1-row aggregates cross-joined (each input is scanned
    once, counts reduce map-side) — no driver-side ``.count()`` actions, no
    ``createDataFrame``. hmean uses the closed form 2·M/(G+P) ≡ 2PR/(P+R)
    with P=M/n_pred, R=M/n_gt, all integer division (exact cross-engine)."""
    m = det_match_pairs(gt, pred).agg(F.count(F.lit(1)).alias("n_match"))
    g = gt.agg(F.count(F.lit(1)).alias("n_gt"))
    p = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    return (
        m.crossJoin(g)
        .crossJoin(p)
        .selectExpr(
            "n_match",
            "n_gt",
            "n_pred",
            "CASE WHEN n_pred = 0 THEN 0 ELSE 1000000 * n_match DIV n_pred END AS precision_micro",
            "CASE WHEN n_gt = 0 THEN 0 ELSE 1000000 * n_match DIV n_gt END AS recall_micro",
            "CASE WHEN n_gt + n_pred = 0 THEN 0 ELSE 2000000 * n_match DIV (n_gt + n_pred) END AS hmean_micro",
        )
    )
