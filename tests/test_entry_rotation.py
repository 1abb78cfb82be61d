"""Driver-contract rotation invariants (__spark_entry__.py).

The external driver verifies only the FIRST 50 entries of queries() per
round, so the ordering IS the coverage mechanism: a regression that lets
already-verified names back into the front-50 silently burns a round's
verification budget. Pure-Python tests — no Spark session."""

import __spark_entry__ as entry
from cartodb_importer_spark.queries import ORACLES, QUERIES

SWEEP_CAP = 50


def test_priority_names_all_registered():
    missing = [n for n in entry._PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_front50_has_no_previously_verified_names():
    verified = entry._previously_verified()
    unverified_total = sum(1 for n in QUERIES if n not in verified)
    front = list(entry.queries())[:SWEEP_CAP]
    overlap = [n for n in front if n in verified]
    if unverified_total >= SWEEP_CAP:
        assert not overlap, f"sweep slots wasted on verified names: {overlap}"
    else:
        # fewer unverified than the cap: every one of them must be in front
        assert {n for n in QUERIES if n not in verified} <= set(front)


def test_front50_all_oracled_or_rows_only_by_design():
    # rows-only-by-design queries carry no oracle deliberately; everything
    # else in the sweep window must have one, or the round yields a weak
    # rows-only verdict for a query that could have had a value check.
    rows_only = {n for n in QUERIES if n not in ORACLES}
    front = list(entry.queries())[:SWEEP_CAP]
    unoracled = [n for n in front if n not in ORACLES and n not in rows_only]
    assert not unoracled


def test_oracle_sql_ordering_matches_queries():
    q = [n for n in entry.queries() if n in ORACLES]
    o = list(entry.oracle_sql())
    assert q == o, "driver may iterate either dict; orders must agree"


def test_registry_oracle_consistency():
    orphans = [n for n in ORACLES if n not in QUERIES]
    assert not orphans, f"oracles without queries: {orphans}"


def test_no_oracle_pin_releases_when_oracle_added(monkeypatch):
    """A rows-only verdict keeps a query out of the sweep head ONLY while
    it still has no oracle (review fix: adding one later must re-queue)."""
    verified = entry._previously_verified()
    # llm_bpe_train has a no_oracle verdict in CORRECTNESS_r03.json and no
    # oracle today => treated as swept
    if "llm_bpe_train" not in ORACLES:
        assert "llm_bpe_train" in verified
    # simulate a later round adding the oracle: the pin must release
    monkeypatch.setitem(ORACLES, "llm_bpe_train", "SELECT 1")
    assert "llm_bpe_train" not in entry._previously_verified()


def test_stale_rotation_fronts_generated_order():
    """In the full-coverage regime (every query has a verdict), the sweep
    front must be: this round's semantics-changed pins, then the head of
    the GENERATED staleness order (tools/rotation.py) — module changed
    after grading round, oldest verdict first. A regression here silently
    re-spends the 50-slot budget on fresh verdicts."""
    from cartodb_importer_spark.queries._rotation import SWEEP_ORDER

    unknown = [n for n in SWEEP_ORDER if n not in QUERIES]
    assert not unknown, f"generated order names not in registry: {unknown}"
    verified = entry._previously_verified()
    if any(n not in verified for n in QUERIES):
        return  # new queries pending: covered by the front50 test above
    front = list(entry.queries())[:SWEEP_CAP]
    pins = [
        n
        for n, rnd in entry._SEMANTICS_CHANGED.items()
        if n in QUERIES and not entry._green_in_round(n, rnd)
    ]
    head = [n for n in SWEEP_ORDER if n not in pins][: SWEEP_CAP - len(pins)]
    assert front == pins + head


def test_semantics_pins_self_retire(monkeypatch, tmp_path):
    """A pin must drop out once a CORRECTNESS_r{N}.json with N >= the
    change round re-greens the query — otherwise it burns a front-50
    slot every round forever (and must survive a malformed artifact)."""
    import json as _json
    import os as _os

    # pins come and go (r08's retired in r09); when present they must name
    # registered queries, or an unretirable typo would burn a front-50
    # slot every round forever (ADVICE r08)
    assert set(entry._SEMANTICS_CHANGED) <= set(entry.queries())
    name = "q1_pricing_summary"  # any registered name exercises the check
    # no artifact from >= round 99 exists, so a pin at round 99 holds
    assert not entry._green_in_round(name, 99)
    # fabricate a round-99 green verdict in an isolated copy of the repo
    # layout: point the module's __file__ at tmp_path
    art = tmp_path / "CORRECTNESS_r99.json"
    art.write_text(
        _json.dumps(
            {name: {"rows_match": True, "schema_match": True, "hash_match": True}}
        )
    )
    (tmp_path / "CORRECTNESS_rbad.json").write_text("{not json")
    monkeypatch.setattr(
        entry, "__file__", _os.path.join(str(tmp_path), "__spark_entry__.py")
    )
    assert entry._green_in_round(name, 99)
    # a failed verdict does not retire the pin
    art.write_text(
        _json.dumps(
            {name: {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    assert not entry._green_in_round(name, 99)
    # an ORACLED query's rows-only verdict must NOT retire its pin — the
    # stale verdict predates the oracle, which has to be checked first
    # (ADVICE r09: mirror _previously_verified's 'name not in ORACLES'
    # guard)
    art.write_text(_json.dumps({name: {"err": "no_oracle", "spark_rows": 7}}))
    assert name in entry.ORACLES  # q1 is oracled: the guard must bind
    assert not entry._green_in_round(name, 99)
    # an oracle-LESS query's rows-only verdict DOES retire its pin, exactly
    # as _previously_verified accepts it (ADVICE r08) — but only when the
    # sweep actually produced rows
    rows_only = "llm_bpe_train"  # rows-only by design, absent from ORACLES
    assert rows_only not in entry.ORACLES
    art.write_text(
        _json.dumps({rows_only: {"err": "no_oracle", "spark_rows": 7}})
    )
    assert entry._green_in_round(rows_only, 99)
    art.write_text(
        _json.dumps({rows_only: {"err": "no_oracle", "spark_rows": None}})
    )
    assert not entry._green_in_round(rows_only, 99)


def test_rotation_hunk_parsing_and_span_intersection():
    """r12 line-range staleness (tools/rotation.py): a query re-stales
    only when a post-grading diff hunk intersects its source span. Pin
    the two pure pieces: -U0 hunk-header parsing (including count-
    omitted single-line hunks and widened pure deletions) and the
    closed-interval intersection."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotation_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools", "rotation.py"),
    )
    rot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rot)

    diff = """\
diff --git a/x.py b/x.py
--- a/x.py
+++ b/x.py
@@ -10,2 +12,3 @@ def f():
+a
+b
+c
@@ -40 +43 @@ def g():
+d
@@ -60,3 +62,0 @@ def h():
-gone
-gone
-gone
"""
    ranges = rot.parse_hunk_ranges(diff)
    # +12,3 -> lines 12-14; +43 (count omitted) -> 43-43; +62,0 (pure
    # deletion) widens to the one-line seam 62-62
    assert ranges == [(12, 14), (43, 43), (62, 62)]

    assert rot.span_intersects((1, 11), ranges) is False
    assert rot.span_intersects((14, 20), ranges) is True   # edge overlap
    assert rot.span_intersects((15, 42), ranges) is False  # between hunks
    assert rot.span_intersects((43, 43), ranges) is True   # single line
    assert rot.span_intersects((50, 70), ranges) is True   # deletion seam
    assert rot.span_intersects((63, 99), ranges) is False
    assert rot.span_intersects((1, 999), []) is False      # no hunks
