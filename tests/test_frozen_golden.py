"""Frozen on-disk golden regression — the TIPC compare_results model
(/root/reference/test_tipc/compare_results.py:10-16,58-80: fresh outputs
diffed against COMMITTED known-good result files).

Unlike the live kernel≡oracle comparisons elsewhere, this pins the ENGINE's
output to a fixture generated once and committed to git
(tests/goldens/extract_sf0001_sample.json) — so a change that drifts kernel
AND oracle together still fails here and must consciously regenerate the
fixture.

Regenerate (only when extraction semantics intentionally change):
    python tests/test_frozen_golden.py --regen
"""

from __future__ import annotations

import hashlib
import json
import os

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "goldens", "extract_sf0001_sample.json"
)


def _generate() -> dict:
    import duckdb

    from paddleocr_spark.corpus import CORPUS_VERSION, generate_rows
    from paddleocr_spark.oracle import oracle_extract

    docs = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id < 40 ORDER BY doc_id"
    ).fetchall()
    turns, full_texts = {}, {}
    for row in generate_rows(docs):
        res = oracle_extract(row["text"])
        key = f'{row["conv_id"]}:{row["turn_idx"]}'
        turns[key] = {
            "kind": res["kind"],
            "n_spans": res["n_spans"],
            "n_dropped": res["n_dropped"],
            "text_md5": hashlib.md5(res["extracted_text"].encode()).hexdigest(),
            "span_kinds": [s[1] for s in res["spans"]],
        }
        if int(row["conv_id"].split("-")[1]) < 3 and row["turn_idx"] < 2:
            full_texts[key] = res["extracted_text"]
    return {"corpus_version": CORPUS_VERSION, "turns": turns, "full_texts": full_texts}


def test_kernel_matches_frozen_golden():
    """The KERNEL's output must equal the committed fixture turn-for-turn."""
    import duckdb

    from paddleocr_spark.corpus import CORPUS_VERSION, generate_rows
    from paddleocr_spark.kernel import assemble_text, extract_payload

    with open(GOLDEN_PATH) as f:
        frozen = json.load(f)
    assert frozen["corpus_version"] == CORPUS_VERSION, (
        "corpus version changed — regenerate the frozen golden consciously"
    )
    docs = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id < 40 ORDER BY doc_id"
    ).fetchall()
    n = 0
    for row in generate_rows(docs):
        key = f'{row["conv_id"]}:{row["turn_idx"]}'
        exp = frozen["turns"][key]
        kind, spans, dropped = extract_payload(row["text"])
        text = assemble_text(spans)
        assert kind == exp["kind"], key
        assert len(spans) == exp["n_spans"], key
        assert dropped == exp["n_dropped"], key
        assert [s[1] for s in spans] == exp["span_kinds"], key
        assert hashlib.md5(text.encode()).hexdigest() == exp["text_md5"], key
        if key in frozen["full_texts"]:
            assert text == frozen["full_texts"][key], key
        n += 1
    assert n == len(frozen["turns"]) == 556


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        data = _generate()
        data["comment"] = (
            "Frozen golden extraction outputs (TIPC compare_results analog). "
            "Regenerate CONSCIOUSLY via this script only when semantics change."
        )
        data["source"] = "/root/testdata/sf0.001/documents.parquet doc_id<40"
        with open(GOLDEN_PATH, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        print(f"regenerated {GOLDEN_PATH}: {len(data['turns'])} turns")
