"""Registration hygiene: a query cannot ship half-covered.

The r6 close registered x324/x325 in the final snapshot commit with
no queries_index.md row, no plan-shape pin, and no
partitioning-invariance entry — the per-operator checklist is human
and humans close rounds in a hurry.  This suite makes the checklist
mechanical: for EVERY name in the query registry it asserts

  (a) a row in queries_index.md (regenerate with
      ``python scripts/make_queries_index.py``),
  (b) a plan-shape assertion in tests/test_plan_shapes.py OR an
      explicit entry in registration_exemptions.PLAN_PIN_EXEMPT,
  (c) a partitioning-invariance entry (SENSITIVE) OR an explicit
      float-insensitive exemption.

Exemption lists are checked both ways: an entry that is no longer a
registry query, or that has since gained the coverage it was exempted
from, fails — the lists can only shrink silently, never rot.
"""

from __future__ import annotations

import re
from pathlib import Path

from fame2pygen_spark.queries import QUERIES

from registration_exemptions import FLOAT_INSENSITIVE, PLAN_PIN_EXEMPT
from test_partitioning_invariance import SENSITIVE

REPO = Path(__file__).resolve().parents[1]
NAMES = set(QUERIES)


def _pinned_in_plan_shapes() -> set:
    """Query names appearing as string literals in the plan-pin
    suite — the mechanical definition of 'has a plan-shape pin'."""
    src = (REPO / "tests" / "test_plan_shapes.py").read_text()
    return NAMES & set(re.findall(r'["\']([a-z]\w+)["\']', src))


def _index_names() -> set:
    src = (REPO / "queries_index.md").read_text()
    return set(re.findall(r"^\|\s*`(\w+)`", src, re.MULTILINE))


def test_every_query_has_an_index_row():
    idx = _index_names()
    missing = sorted(NAMES - idx)
    stale = sorted(idx - NAMES)
    assert not missing, (
        f"queries registered without a queries_index.md row "
        f"(run scripts/make_queries_index.py): {missing}"
    )
    assert not stale, f"index rows for unregistered queries: {stale}"


def test_every_query_is_plan_pinned_or_explicitly_exempt():
    pinned = _pinned_in_plan_shapes()
    exempt = set(PLAN_PIN_EXEMPT)
    uncovered = sorted(NAMES - pinned - exempt)
    assert not uncovered, (
        "queries with neither a plan-shape pin nor a "
        f"PLAN_PIN_EXEMPT entry: {uncovered}"
    )


def test_plan_pin_exemptions_do_not_rot():
    pinned = _pinned_in_plan_shapes()
    exempt = set(PLAN_PIN_EXEMPT)
    assert len(exempt) == len(PLAN_PIN_EXEMPT), "duplicate entries"
    overlap = sorted(exempt & pinned)
    assert not overlap, (
        f"now pinned — remove from PLAN_PIN_EXEMPT: {overlap}"
    )
    stale = sorted(exempt - NAMES)
    assert not stale, f"PLAN_PIN_EXEMPT names no registry query: {stale}"


def test_readme_registry_count_is_current():
    """README's front-door 'N-query registry' claim must equal the
    live registry size (r7 verdict #3: the count rotted 402 vs 417
    because only queries_index.md was gated)."""
    src = (REPO / "README.md").read_text()
    claims = re.findall(r"(\d+)-query registry", src)
    assert claims, "README no longer states an 'N-query registry' count"
    for c in claims:
        assert int(c) == len(NAMES), (
            f"README says {c}-query registry but the registry has "
            f"{len(NAMES)} queries — update README.md"
        )


def test_every_query_is_invariance_swept_or_explicitly_exempt():
    covered = set(SENSITIVE) | set(FLOAT_INSENSITIVE)
    uncovered = sorted(NAMES - covered)
    assert not uncovered, (
        "queries in neither the SENSITIVE invariance sweep nor "
        f"FLOAT_INSENSITIVE: {uncovered}"
    )


def test_invariance_exemptions_do_not_rot():
    sens = set(SENSITIVE)
    exempt = set(FLOAT_INSENSITIVE)
    assert len(exempt) == len(FLOAT_INSENSITIVE), "duplicate entries"
    overlap = sorted(exempt & sens)
    assert not overlap, (
        f"in BOTH SENSITIVE and FLOAT_INSENSITIVE — pick one: {overlap}"
    )
    stale = sorted(exempt - NAMES)
    assert not stale, f"FLOAT_INSENSITIVE names no registry query: {stale}"
    stale_s = sorted(sens - NAMES)
    assert not stale_s, f"SENSITIVE names no registry query: {stale_s}"
