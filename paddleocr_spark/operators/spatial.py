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
    # two degenerate (zero-area) boxes give union 0; IoU is then defined as 0
    # (the reference's float path yields nan and never matches,
    # ppocr/metrics/eval_det_iou.py) — under ANSI SQL a plain divide would
    # abort the whole job instead.
    return (
        F.when(union <= 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * inter / union))
        .cast("long")
    )


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


def _tm_features(j: DataFrame) -> DataFrame:
    """Per-pair features of the TableMaster matcher (columns o{x0..y1} vs
    c{x0..y1}): intersection area, and 2× the CONVEX-HULL area of the two
    boxes — TableMaster's IoU denominator is the hull of both boxes' corner
    points (/root/reference/ppstructure/table/table_master_match.py:117-133),
    not the union. Closed form for axis-aligned boxes: bounding-box area
    minus one right triangle per bounding-box corner whose x- and y-extremes
    are attained by DIFFERENT boxes (legs = the coordinate deltas); doubling
    keeps everything integer-exact. Fuzz-verified against a monotone-chain
    hull in tests/test_table_master.py."""
    ox0, oy0, ox1, oy1 = (F.col(c) for c in ("ox0", "oy0", "ox1", "oy1"))
    cx0, cy0, cx1, cy1 = (F.col(c) for c in ("cx0", "cy0", "cx1", "cy1"))
    iw = F.least(ox1, cx1) - F.greatest(ox0, cx0)
    ih = F.least(oy1, cy1) - F.greatest(oy0, cy0)
    inter = F.when((iw > 0) & (ih > 0), iw * ih).otherwise(F.lit(0))
    bbw = F.greatest(ox1, cx1) - F.least(ox0, cx0)
    bbh = F.greatest(oy1, cy1) - F.least(oy0, cy0)

    def cut(dx, dy, sign_negative: bool):
        prod = dx * dy
        cond = (prod < 0) if sign_negative else (prod > 0)
        return F.when(cond, F.abs(dx) * F.abs(dy)).otherwise(F.lit(0))

    cuts = (
        cut(ox0 - cx0, oy0 - cy0, True)     # bottom-left corner
        + cut(ox1 - cx1, oy0 - cy0, False)  # bottom-right
        + cut(ox0 - cx0, oy1 - cy1, False)  # top-left
        + cut(ox1 - cx1, oy1 - cy1, True)   # top-right
    )
    hull2 = F.lit(2) * bbw * bbh - cuts  # 2 × hull area, integer
    iou = F.when(hull2 > 0, F.lit(2.0) * inter / hull2).otherwise(F.lit(0.0))
    return (
        j.withColumn("inter", inter)
        .withColumn("hull2", hull2)
        .withColumn("iou", iou)
        .withColumn(
            "dist2",
            (ox0 + ox1 - cx0 - cx1) * (ox0 + ox1 - cx0 - cx1)
            + (oy0 + oy1 - cy0 - cy1) * (oy0 + oy1 - cy0 - cy1),
        )
    )


def table_master_match_pairs(ocr: DataFrame, cells: DataFrame) -> DataFrame:
    """TableMasterMatcher rule cascade (/root/reference/ppstructure/table/
    table_master_match.py — center_rule_match :321-345, iou_rule_match
    :346-377, distance_rule_match :378-405, orchestrated at :775-850):

    1. **center**: every (ocr, cell) pair whose ocr center lies inside the
       cell box (inclusive; many-to-many — the reference appends all pairs).
    2. **iou**: each ocr UNMATCHED by rule 1 → the argmax-hull-IoU cell with
       iou > 0 (strict first-max ⇒ lowest cell_id tie-break).
    3. **distance**: each cell unmatched by rules 1-2 → the argmin
       center-distance ocr among ocrs unmatched by rules 1-2 (strict
       first-min ⇒ lowest ocr_id tie-break; one ocr may serve several
       cells — the reference does not consume matches here).

    The virtual-master ``extra_match``/token-insertion step
    (:407-421, `_format`) belongs to the HTML token assembly and is covered
    by get_pred_html (functions/htmltok.py); it emits no (ocr, cell) pairs.

    Inputs need (page_id, box_id, x0, y0, x1, y1). Output:
    (page_id, ocr_id, cell_id, rule). Everything is joins + windows on the
    (page_id)-keyed cross-score — hash-partitions cleanly at any scale.
    """
    o = ocr.select(
        "page_id",
        F.col("box_id").alias("ocr_id"),
        *[F.col(c).alias(f"o{c}") for c in ("x0", "y0", "x1", "y1")],
    )
    c = cells.select(
        "page_id",
        F.col("box_id").alias("cell_id"),
        *[F.col(cc).alias(f"c{cc}") for cc in ("x0", "y0", "x1", "y1")],
    )
    feat = _tm_features(o.join(c, "page_id"))

    in_x = ((F.col("ox0") + F.col("ox1")) >= 2 * F.col("cx0")) & (
        (F.col("ox0") + F.col("ox1")) <= 2 * F.col("cx1")
    )
    in_y = ((F.col("oy0") + F.col("oy1")) >= 2 * F.col("cy0")) & (
        (F.col("oy0") + F.col("oy1")) <= 2 * F.col("cy1")
    )
    r1 = feat.filter(in_x & in_y).select(
        "page_id", "ocr_id", "cell_id", F.lit("center").alias("rule")
    )

    keys_oc = ["page_id", "ocr_id"]
    r2 = (
        feat.join(r1.select(*keys_oc).distinct(), keys_oc, "left_anti")
        .filter(F.col("inter") > 0)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("page_id", "ocr_id").orderBy(
                    F.col("iou").desc(), F.col("cell_id").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("page_id", "ocr_id", "cell_id", F.lit("iou").alias("rule"))
    )

    m12 = r1.select("page_id", "ocr_id", "cell_id").unionByName(
        r2.select("page_id", "ocr_id", "cell_id")
    )
    r3 = (
        feat.join(m12.select("page_id", "cell_id").distinct(), ["page_id", "cell_id"], "left_anti")
        .join(m12.select("page_id", "ocr_id").distinct(), ["page_id", "ocr_id"], "left_anti")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("page_id", "cell_id").orderBy(
                    F.col("dist2").asc(), F.col("ocr_id").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("page_id", "ocr_id", "cell_id", F.lit("distance").alias("rule"))
    )
    return r1.unionByName(r2).unionByName(r3)
