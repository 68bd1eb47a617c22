"""Invariants for the self-computing certification window.

The correctness driver checks the FIRST 50 registry entries each round;
``pg_lake_spark.queries`` reorders the registry at import from the
``CORRECTNESS_r*.json`` artifacts. r11's defining defect was a
hand-edited window that shipped stale — these tests pin the computed
ordering so that can never recur: never-driver-checked rows lead,
changed-code rows (manifest entries newer than their latest green)
follow, then everything else stalest-first, and manifest entries expire
on their own once a green postdates them.
"""

from __future__ import annotations

import pg_lake_spark.queries as Q
from pg_lake_spark.queries import QUERIES


def _groups():
    latest = Q._latest_green()
    order = list(QUERIES)

    def group(name: str) -> int:
        green = latest.get(name)
        if green is None:
            return 0
        if Q._CODE_CHANGED_IN.get(name, -1) > green:
            return 1
        return 2

    return latest, order, group


def test_groups_are_contiguous_and_ordered():
    latest, order, group = _groups()
    seq = [group(n) for n in order]
    assert seq == sorted(seq), "never < changed-code < green, contiguously"


def test_never_checked_rows_lead_the_window():
    latest, order, group = _groups()
    never = {n for n in order if group(n) == 0}
    if never:  # fresh clone with no artifacts: everything is group 0
        assert set(order[: len(never)]) == never


def test_stale_rows_sorted_oldest_green_first():
    latest, order, group = _groups()
    greens = [latest[n] for n in order if group(n) == 2]
    assert greens == sorted(greens)


def test_changed_code_manifest_expires_once_green_postdates():
    """A manifest entry with round <= latest green must NOT outrank
    ordinary stale rows — certification clears the flag automatically."""
    latest, order, group = _groups()
    for name, rnd in Q._CODE_CHANGED_IN.items():
        assert name in QUERIES, f"manifest names unknown row {name}"
        green = latest.get(name)
        if green is not None and green >= rnd:
            assert group(name) == 2, (
                f"{name}: green r{green} >= change r{rnd}, flag must expire"
            )


def test_manifest_rows_inside_window_until_certified():
    """While a changed-code flag is live, the row must sort ahead of
    every ordinary stale row (group 2). Whether it lands in the front
    50 depends on how many never-checked rows exist — a CAPACITY fact,
    not a rotation invariant — so assert the ordering, and the window
    membership only while capacity allows."""
    latest, order, group = _groups()
    pos = {n: i for i, n in enumerate(order)}
    live = [
        n for n, rnd in Q._CODE_CHANGED_IN.items()
        if latest.get(n) is None or latest[n] < rnd
    ]
    first_stale = min(
        (pos[n] for n in order if group(n) == 2), default=len(order)
    )
    for name in live:
        if group(name) == 1:  # never-checked rows are group 0 anyway
            assert pos[name] < first_stale, (
                f"{name}: live changed-code row sorted after a stale row"
            )
    n_priority = sum(1 for n in order if group(n) in (0, 1))
    if n_priority <= 50:
        front = set(order[:50])
        for name in live:
            assert name in front, f"{name} fits the window but is outside it"
