"""Verification-window rotation guards.

The driver externally checks only the first `registry.WINDOW` entries of
`queries()` per round, so with more registered queries than slots the
window must ROTATE. These tests make the invariant loud instead of
conventional:

  1. every `_PRIORITY` name must be a registered query (a typo or rename
     would silently reshuffle the externally-checked slice);
  2. every registered query is either in the current window or has a row
     in one of the LAST TWO committed CORRECTNESS_r*.json records — i.e.
     nothing goes more than two recorded rounds without an external
     driver check. Registering a new query without adding it to
     `_PRIORITY` fails here immediately.

Cadence history: rounds 2–5 enforced a strict one-record bound. The
round-5 driver record was never committed (no CORRECTNESS_r05.json),
which makes a one-record bound unsatisfiable at 100 queries — the newest
record holds 50 rows and the other 50 queries cannot all fit one 50-slot
window. The bound is now a two-record union (supports up to 150 queries,
staleness ≤ 2 recorded rounds); see registry.py's cadence note and
SURVEY §8.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from koby_s_ai_vector_db_spark import registry

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recent_correctness(n: int = 2) -> tuple[list[str], dict]:
    """The last-n committed records, merged newest-wins per query."""
    paths = sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        pytest.skip("no committed CORRECTNESS record yet (round 1)")
    merged: dict = {}
    for p in paths[-n:]:  # oldest → newest so newest rows win
        with open(p) as fh:
            merged.update(json.load(fh))
    return paths[-n:], merged


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


def test_every_query_checked_within_two_records():
    paths, record = _recent_correctness()
    window = list(registry.queries())[: registry.WINDOW]
    covered = set(window) | set(record)
    missing = sorted(set(registry.queries()) - covered)
    assert not missing, (
        f"queries neither in the current {registry.WINDOW}-slot window nor "
        f"in the last two committed records {[os.path.basename(p) for p in paths]}"
        f" — they would exceed the documented staleness bound: {missing}"
    )


def test_newest_round_artifacts_are_git_tracked():
    """Round artifacts shipped uncommitted two rounds running (r11, r12
    verdicts both flagged it). Make the discipline mechanical: the newest
    CORRECTNESS_r*.json and BENCH_r*.json on disk must be git-tracked.
    Like the rotation test above, this is a start-of-round forcing
    function — the driver writes CORRECTNESS_r{N}.json at round end, so
    the next session's first pytest run goes red until the artifact is
    committed (alongside the window rotation it forces anyway)."""
    import subprocess

    try:
        tracked = subprocess.run(
            ["git", "ls-files"], cwd=_ROOT, capture_output=True, text=True,
            timeout=30, check=True,
        ).stdout.splitlines()
    except (OSError, subprocess.SubprocessError):
        pytest.skip("git unavailable")
    tracked_set = set(tracked)
    untracked = []
    for pattern in ("CORRECTNESS_r*.json", "BENCH_r*.json"):
        paths = sorted(glob.glob(os.path.join(_ROOT, pattern)))
        if paths:
            newest = os.path.basename(paths[-1])
            if newest not in tracked_set:
                untracked.append(newest)
    assert not untracked, (
        f"newest round artifacts on disk are not git-tracked: {untracked} "
        f"— commit them (VERDICT r12 item 4: artifacts shipped uncommitted "
        f"two rounds running)"
    )


def test_last_recorded_row_was_green():
    """A query rotated OUT of the window must have left on a green row —
    rotating out a red query would hide a known regression. Queries
    registered WITHOUT an oracle get the driver's weaker rows-only check,
    so hash_match is only demanded where an oracle exists."""
    paths, record = _recent_correctness()
    window = set(list(registry.queries())[: registry.WINDOW])
    with_oracle = set(registry.oracle_sql())

    def green(n, row):
        if n not in with_oracle:
            # Rows-only query: the driver records err='no_oracle' with
            # the observed row count and null match fields. Green = it
            # ran and produced rows.
            return (
                row.get("err") in (None, "no_oracle")
                and row.get("spark_rows") is not None
                and row["spark_rows"] > 0
            )
        if row.get("err"):
            return False
        if not row.get("rows_match"):
            return False
        return row.get("hash_match", False)

    bad = {
        n: row for n, row in record.items()
        if n not in window and not green(n, row)
    }
    assert not bad, (
        f"queries rotated out of the window whose most recent row in "
        f"{[os.path.basename(p) for p in paths]} is non-green: {bad}"
    )
