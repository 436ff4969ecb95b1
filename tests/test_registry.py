"""Driver-contract registry invariants.

The driver records correctness for the FIRST 50 entries of ``queries()`` in
dict order (observed round 2: CORRECTNESS_r02.json was exactly the first 50
of 58, silently dropping the flagship family registered last). These
invariants freeze the round-3 fix: the 8 extract_* golden-equality queries
come first, the registry holds exactly 50 entries, and every query carries
an exact DuckDB oracle with no strays.
"""

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_window_and_oracle_parity():
    m = _load_entry()
    q = m.queries()
    o = m.oracle_sql()
    names = list(q)
    assert len(names) == 50, (
        f"registry must stay EXACTLY 50 entries (driver window); got "
        f"{len(names)} — fold near-duplicates instead of appending"
    )
    flagship = [
        "extract_flagship",
        "extract_spans",
        "extract_paragraphs",
        "extract_formula",
        "extract_plain_sql",
        "extract_walk",
        "extract_routed",
        "extract_kind_stats",
    ]
    assert names[: len(flagship)] == flagship, (
        "the extract_* golden-equality family must be registered FIRST "
        f"(driver records the first 50 in dict order); head is {names[:8]}"
    )
    assert set(q) == set(o), (
        f"1:1 query/oracle parity broken: missing={sorted(set(q) - set(o))} "
        f"stray={sorted(set(o) - set(q))}"
    )
    assert "e2e_spotting" in q  # the §2.9 closer stays registered
