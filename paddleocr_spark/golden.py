"""Golden extraction relations for the driver's DuckDB correctness gate.

The extraction pipeline is a pandas-UDF kernel — not re-derivable in SQL from
the raw tables. The reference solves the same problem with golden-output
regression files: TIPC freezes known-good `system_results.txt` outputs and
compares fresh runs against them (/root/reference/test_tipc/
compare_results.py:10-16,58-80). This module is that mechanism expressed in
the driver contract:

- ``ensure_golden(sf_dir)`` runs the **pure-Python oracle**
  (``paddleocr_spark.oracle`` — an independent single-threaded re-derivation
  of the SPEC, property-fuzzed against the kernel in tests/) over the corpus
  synthesized from ``{sf_dir}/documents.parquet`` and freezes the per-turn
  golden relations as parquet under ``/tmp/paddleocr_spark_golden/<sf>``.
  No Spark involved: the golden side shares zero execution machinery with
  the engine under test.
- ``oracle_sql()`` entries for the ``extract_*`` queries then read the frozen
  relations with DuckDB ``read_parquet`` — the driver's rows/schema/value-hash
  compare becomes a hard golden-equality check of the flagship itself.

Golden tables (per sf dir):
- ``corpus.parquet``             — (conv_id, turn_idx, role, tool, text_chars,
  text) — the raw payload text is frozen so the e2e_spotting oracle can
  re-parse it in SQL (an independent re-derivation, not a readback)
- ``extract.parquet``            — default-config extraction: per-turn kind,
  span structs (score in floored micro-units), extracted_text, markdown
  (pure-Python mirror of operators/markdown.py, i.e. the
  convert_info_markdown analog), drop counts
- ``extract_paras.parquet``      — merge_paragraphs=True variant

Staleness: the content stamp covers documents.parquet (size+mtime), both
config digests and ``GOLDEN_VERSION``; regeneration is atomic (tmp file +
``os.replace``), so a concurrent reader never sees a partial table.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import math
import os
import re

from .config import DEFAULT_CONFIG, ExtractConfig
from .corpus import CORPUS_VERSION, generate_rows
from .oracle import oracle_extract

GOLDEN_ROOT = "/tmp/paddleocr_spark_golden"
GOLDEN_VERSION = 5  # bump when oracle semantics / golden schemas change
# v4 (round 3): corpus.parquet carries the raw payload ``text`` so the
# e2e_spotting DuckDB oracle can re-parse payloads in SQL — an independent
# re-derivation, not a frozen-result readback.
# v5 (round 4): real %PDF- payloads (kind pdf_real, SPEC §3b) join the corpus
# mix; the pdf-variant golden gates cover both pdf kinds.

PARA_CONFIG = ExtractConfig(merge_paragraphs=True)
FORMULA_CONFIG = ExtractConfig(detect_formula=True)
WALK_CONFIG = ExtractConfig(layout_mode="walk")

_MD_ESC_RE = re.compile(r"([*`~$])")
_SQUEEZE_RE = re.compile(r"\n{3,}")


def render_markdown_py(spans) -> str:
    """Pure-Python mirror of operators/markdown.py ``render_markdown``
    (convert_info_markdown analog, /root/reference/ppstructure/recovery/
    recovery_to_markdown.py:129-187): per-kind dispatch, ``* ` ~ $`` escaping
    for prose kinds, blank-line join, ≥3-newline squeeze."""

    def one(kind: str, text: str) -> str:
        esc = _MD_ESC_RE.sub(r"\\\1", text)
        if kind == "title":
            return "# " + esc
        if kind == "formula":
            return "$$\n" + text + "\n$$"
        if kind == "code":
            return "```\n" + text + "\n```"
        if kind == "list":
            return "- " + esc.replace("\n", "\n- ")
        if kind == "table":
            return "| " + text.replace("\n", " |\n| ") + " |"
        return esc

    return _SQUEEZE_RE.sub("\n\n", "\n\n".join(one(s[1], s[2]) for s in spans))


def _cfg_digest(cfg: ExtractConfig) -> str:
    d = dataclasses.asdict(cfg)
    d["boiler_tags"] = sorted(d["boiler_tags"])
    return hashlib.md5(json.dumps(d, sort_keys=True).encode()).hexdigest()[:12]


def golden_dir(sf_dir: str) -> str:
    return os.path.join(GOLDEN_ROOT, os.path.basename(os.path.abspath(sf_dir)))


def _stamp(sf_dir: str) -> str:
    doc = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc)
    return (
        f"v{GOLDEN_VERSION}:c{CORPUS_VERSION}:{st.st_size}:{st.st_mtime_ns}:"
        f"{_cfg_digest(DEFAULT_CONFIG)}:{_cfg_digest(PARA_CONFIG)}:"
        f"{_cfg_digest(FORMULA_CONFIG)}:{_cfg_digest(WALK_CONFIG)}"
    )


def ensure_golden(sf_dir: str) -> str:
    """Build (if stale/missing) and return the golden dir for ``sf_dir``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dest = golden_dir(sf_dir)
    meta_path = os.path.join(dest, "meta.json")
    stamp = _stamp(sf_dir)
    try:
        with open(meta_path) as f:
            if json.load(f).get("stamp") == stamp:
                return dest
    except (OSError, ValueError):
        pass

    import duckdb

    doc_items = duckdb.sql(
        "SELECT doc_id, text FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}') "
        "ORDER BY doc_id"
    ).fetchall()

    corpus_rows = {
        k: [] for k in ("conv_id", "turn_idx", "role", "tool", "text_chars", "text")
    }
    ex_rows = {
        k: []
        for k in (
            "conv_id",
            "turn_idx",
            "role",
            "payload_kind",
            "n_spans",
            "n_dropped",
            "extracted_text",
            "markdown",
            "spans",
        )
    }
    para_rows = {
        k: []
        for k in ("conv_id", "turn_idx", "payload_kind", "n_spans", "extracted_text")
    }
    formula_rows = {
        k: []
        for k in (
            "conv_id",
            "turn_idx",
            "payload_kind",
            "n_spans",
            "n_formula",
            "extracted_text",
        )
    }
    walk_rows = {
        k: []
        for k in ("conv_id", "turn_idx", "payload_kind", "n_spans", "extracted_text")
    }

    for row in generate_rows(doc_items):
        corpus_rows["conv_id"].append(row["conv_id"])
        corpus_rows["turn_idx"].append(row["turn_idx"])
        corpus_rows["role"].append(row["role"])
        corpus_rows["tool"].append(row["tool"])
        corpus_rows["text_chars"].append(len(row["text"]))
        corpus_rows["text"].append(row["text"])

        res = oracle_extract(row["text"], DEFAULT_CONFIG)
        ex_rows["conv_id"].append(row["conv_id"])
        ex_rows["turn_idx"].append(row["turn_idx"])
        ex_rows["role"].append(row["role"])
        ex_rows["payload_kind"].append(res["kind"])
        ex_rows["n_spans"].append(res["n_spans"])
        ex_rows["n_dropped"].append(res["n_dropped"])
        ex_rows["extracted_text"].append(res["extracted_text"])
        ex_rows["markdown"].append(render_markdown_py(res["spans"]))
        ex_rows["spans"].append(
            [
                {
                    "span_idx": i,
                    "kind": k,
                    "text": t,
                    "score_micro": math.floor(s * 1e6),
                }
                for (i, k, t, s, _b) in res["spans"]
            ]
        )

        # merge_paragraphs only changes the pdf paths; html/plain results are
        # identical by construction (config gates _oracle_para_merge only)
        if res["kind"] in ("pdf", "pdf_real"):
            res_p = oracle_extract(row["text"], PARA_CONFIG)
        else:
            res_p = res
        para_rows["conv_id"].append(row["conv_id"])
        para_rows["turn_idx"].append(row["turn_idx"])
        para_rows["payload_kind"].append(res_p["kind"])
        para_rows["n_spans"].append(res_p["n_spans"])
        para_rows["extracted_text"].append(res_p["extracted_text"])

        # detect_formula reclassifies only $$-wrapped para spans; payloads
        # without them yield results identical to the default config
        if "$$" in row["text"]:
            res_f = oracle_extract(row["text"], FORMULA_CONFIG)
        else:
            res_f = res
        formula_rows["conv_id"].append(row["conv_id"])
        formula_rows["turn_idx"].append(row["turn_idx"])
        formula_rows["payload_kind"].append(res_f["kind"])
        formula_rows["n_spans"].append(res_f["n_spans"])
        formula_rows["n_formula"].append(
            sum(1 for s in res_f["spans"] if s[1] == "formula")
        )
        formula_rows["extracted_text"].append(res_f["extracted_text"])

        # layout_mode="walk" only changes the pdf ordering paths
        if res["kind"] in ("pdf", "pdf_real"):
            res_w = oracle_extract(row["text"], WALK_CONFIG)
        else:
            res_w = res
        walk_rows["conv_id"].append(row["conv_id"])
        walk_rows["turn_idx"].append(row["turn_idx"])
        walk_rows["payload_kind"].append(res_w["kind"])
        walk_rows["n_spans"].append(res_w["n_spans"])
        walk_rows["extracted_text"].append(res_w["extracted_text"])

    os.makedirs(dest, exist_ok=True)

    def write(name: str, cols: dict, schema: "pa.Schema") -> None:
        table = pa.table({k: pa.array(v, schema.field(k).type) for k, v in cols.items()})
        tmp = os.path.join(dest, f".{name}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(dest, name))

    span_t = pa.list_(
        pa.struct(
            [
                ("span_idx", pa.int64()),
                ("kind", pa.string()),
                ("text", pa.string()),
                ("score_micro", pa.int64()),
            ]
        )
    )
    write(
        "corpus.parquet",
        corpus_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("tool", pa.string()),
                ("text_chars", pa.int64()),
                ("text", pa.string()),
            ]
        ),
    )
    write(
        "extract.parquet",
        ex_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("payload_kind", pa.string()),
                ("n_spans", pa.int64()),
                ("n_dropped", pa.int64()),
                ("extracted_text", pa.string()),
                ("markdown", pa.string()),
                ("spans", span_t),
            ]
        ),
    )
    write(
        "extract_paras.parquet",
        para_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("payload_kind", pa.string()),
                ("n_spans", pa.int64()),
                ("extracted_text", pa.string()),
            ]
        ),
    )
    write(
        "extract_formula.parquet",
        formula_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("payload_kind", pa.string()),
                ("n_spans", pa.int64()),
                ("n_formula", pa.int64()),
                ("extracted_text", pa.string()),
            ]
        ),
    )
    write(
        "extract_walk.parquet",
        walk_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("payload_kind", pa.string()),
                ("n_spans", pa.int64()),
                ("extracted_text", pa.string()),
            ]
        ),
    )

    tmp_meta = os.path.join(dest, ".meta.json.tmp")
    with open(tmp_meta, "w") as f:
        json.dump({"stamp": stamp, "sf_dir": os.path.abspath(sf_dir)}, f)
    os.replace(tmp_meta, meta_path)
    return dest
