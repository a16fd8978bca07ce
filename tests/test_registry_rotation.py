"""Verification-window rotation guards.

The driver externally checks only the first `registry.WINDOW` entries of
`queries()` per round, so with more registered queries than slots the
window must ROTATE. These tests make the invariant loud instead of
conventional:

  1. every `_PRIORITY` name must be a registered query (a typo or rename
     would silently reshuffle the externally-checked slice);
  2. every registered query is either in the current window or has a green
     row in the newest committed CORRECTNESS_r*.json — i.e. nothing goes
     more than one round without an external driver check. Registering a
     new query without adding it to `_PRIORITY` fails here immediately.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from koby_s_ai_vector_db_spark import registry

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_correctness() -> tuple[str, dict]:
    paths = sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        pytest.skip("no committed CORRECTNESS record yet (round 1)")
    with open(paths[-1]) as fh:
        return paths[-1], json.load(fh)


def test_priority_names_are_registered():
    names = set(registry.queries())
    unknown = [n for n in registry._PRIORITY if n not in names]
    assert not unknown, unknown


def test_priority_has_no_duplicates_and_fills_window():
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))
    # The window is a scarce resource: an under-filled _PRIORITY leaves
    # slot assignment to registration order, an over-filled one silently
    # pushes its own tail out of the checked slice.
    assert len(registry._PRIORITY) <= registry.WINDOW


def test_every_query_checked_within_one_round():
    path, record = _latest_correctness()
    window = list(registry.queries())[: registry.WINDOW]
    covered = set(window) | set(record)
    missing = sorted(set(registry.queries()) - covered)
    assert not missing, (
        f"queries neither in the current {registry.WINDOW}-slot window nor "
        f"in {os.path.basename(path)} — they would go 2+ rounds unchecked: "
        f"{missing}"
    )


def test_latest_record_was_green():
    """A query rotated OUT of the window must have left on a green row —
    rotating out a red query would hide a known regression. Queries
    registered WITHOUT an oracle get the driver's weaker rows-only check,
    so hash_match is only demanded where an oracle exists."""
    path, record = _latest_correctness()
    window = set(list(registry.queries())[: registry.WINDOW])
    with_oracle = set(registry.oracle_sql())

    def green(n, row):
        if row.get("err"):
            return False
        if not row.get("rows_match"):
            return False
        return row.get("hash_match", False) or n not in with_oracle

    bad = {
        n: row for n, row in record.items()
        if n not in window and not green(n, row)
    }
    assert not bad, f"queries rotated out of the window with non-green rows in {path}: {bad}"
