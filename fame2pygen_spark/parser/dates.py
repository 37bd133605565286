"""FAME date-literal normalization.

FAME scripts write dates in at least seven formats (reference semantics:
``/root/reference/fame2pygen/formulas_generator.py:312-380``).  We
normalize every one of them to a ``datetime.date`` so the rest of the
engine only ever deals with ISO dates.

Supported input formats
-----------------------
=============  ==================  =================
format         example             normalizes to
=============  ==================  =================
ISO            ``2020-01-31``      2020-01-31
quarterly      ``2020Q1``          2020-01-01
day-month-yr   ``12jul1985``       1985-07-12
annual         ``2020``            2020-01-01
monthly 'm'    ``2020m03``         2020-03-01
month-name     ``jan2020``         2020-01-01
weekly         ``2020.05``         Jan 1 + 4 weeks
=============  ==================  =================

The open-range wildcard ``*`` maps to ``None``.
"""

from __future__ import annotations

import re
from datetime import date, timedelta

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

_ISO_RE = re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$")
_QUARTER_RE = re.compile(r"^(\d{4})[qQ]([1-4])$")
_DMY_RE = re.compile(r"^(\d{1,2})([A-Za-z]{3})(\d{4})$")
_YEAR_RE = re.compile(r"^(\d{4})$")
_YM_RE = re.compile(r"^(\d{4})[mM](\d{1,2})$")
_MONYR_RE = re.compile(r"^([A-Za-z]{3})(\d{4})$")
_WEEK_RE = re.compile(r"^(\d{4})\.(\d{1,2})$")


def parse_fame_date(text: str | None) -> date | None:
    """Parse a FAME date literal into a ``datetime.date``.

    Returns ``None`` for the wildcard ``*`` / empty input.  Raises
    ``ValueError`` when the text matches no known FAME date format.
    """
    if text is None:
        return None
    s = str(text).strip().strip("\"'")
    if not s or s == "*":
        return None

    m = _ISO_RE.match(s)
    if m:
        return date(int(m.group(1)), int(m.group(2)), int(m.group(3)))

    m = _QUARTER_RE.match(s)
    if m:
        year, quarter = int(m.group(1)), int(m.group(2))
        return date(year, (quarter - 1) * 3 + 1, 1)

    m = _DMY_RE.match(s)
    if m:
        mon = _MONTHS.get(m.group(2).lower())
        if mon:
            return date(int(m.group(3)), mon, int(m.group(1)))

    m = _YEAR_RE.match(s)
    if m:
        return date(int(m.group(1)), 1, 1)

    m = _YM_RE.match(s)
    if m:
        return date(int(m.group(1)), int(m.group(2)), 1)

    m = _MONYR_RE.match(s)
    if m:
        mon = _MONTHS.get(m.group(1).lower())
        if mon:
            return date(int(m.group(2)), mon, 1)

    m = _WEEK_RE.match(s)
    if m:
        return date(int(m.group(1)), 1, 1) + timedelta(weeks=int(m.group(2)) - 1)

    raise ValueError(f"unrecognized FAME date literal: {text!r}")


def looks_like_fame_date(text: str) -> bool:
    """True when *text* matches one of the FAME date-literal formats."""
    try:
        return parse_fame_date(text) is not None
    except ValueError:
        return False
