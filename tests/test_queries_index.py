"""queries_index.md freshness gate: the committed index must match a
regeneration from the live registry — add a query without rerunning
``python scripts/make_queries_index.py`` and this fails."""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_index_is_current():
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from make_queries_index import build_index

    with open(os.path.join(_REPO, "queries_index.md")) as fh:
        committed = fh.read()
    assert committed == build_index(), (
        "queries_index.md is stale — run python scripts/make_queries_index.py"
    )
