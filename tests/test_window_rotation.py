"""Invariants for the self-computing certification window.

The correctness driver checks the FIRST 50 registry entries each round;
``pg_lake_spark.queries`` reorders the registry at import from the
``CORRECTNESS_r*.json`` artifacts. r11's defining defect was a
hand-edited window that shipped stale — these tests pin the computed
ordering so that can never recur: never-driver-checked rows lead,
changed-code rows (manifest entries newer than their latest green)
follow, then everything else stalest-first, manifest entries expire on
their own once a green postdates them, AND (r16) a starvation floor
reserves ``_STALE_FLOOR`` window slots for the stalest green rows so an
oversized flag batch can never again age the tail indefinitely (r15
verdict #2: the same 4 rows slipped two consecutive rounds).
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


def test_priority_rows_lead_up_to_the_floor_cap():
    """Groups 0/1 fill the window head, but never past window-floor
    slots; whatever fits is contiguous at the front."""
    latest, order, group = _groups()
    n_priority = sum(1 for n in order if group(n) < 2)
    lead = min(n_priority, Q._WINDOW - Q._STALE_FLOOR)
    assert all(group(n) < 2 for n in order[:lead])
    seq = [group(n) for n in order[:lead]]
    assert seq == sorted(seq), "never-checked before changed-code"


def test_never_checked_rows_lead_the_window():
    latest, order, group = _groups()
    never = {n for n in order if group(n) == 0}
    if never and len(never) <= Q._WINDOW - Q._STALE_FLOOR:
        assert set(order[: len(never)]) == never


def test_stale_floor_always_certifies_the_stalest_rows():
    """At least min(floor, #green rows) of the window must be green
    rows, and they must be exactly the STALEST ones."""
    latest, order, group = _groups()
    greens_sorted = sorted(
        (n for n in order if group(n) == 2), key=lambda n: latest[n]
    )
    want = greens_sorted[: Q._STALE_FLOOR]
    window = set(order[: Q._WINDOW])
    for name in want:
        assert name in window, (
            f"{name} (green r{latest[name]}) is among the "
            f"{Q._STALE_FLOOR} stalest rows but missed the window"
        )


def test_stale_rows_sorted_oldest_green_first():
    """Among green rows, window members and the post-window tail are
    each stalest-first (the floor may split them into two runs but
    never reorders within a run)."""
    latest, order, group = _groups()
    greens = [latest[n] for n in order if group(n) == 2]
    in_window = greens[: Q._STALE_FLOOR]
    assert in_window == sorted(in_window)
    tail = greens[Q._STALE_FLOOR:]
    assert tail == sorted(tail)


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


def test_manifest_is_max_merge_of_append_only_pairs():
    """_CODE_CHANGED_IN derives from _CODE_CHANGES by explicit
    max-merge — repeated appends for the same row keep the max round
    regardless of list order (r15 verdict #4: the old dict literal's
    duplicate keys silently kept the LAST value, correct only while
    appends stayed chronological)."""
    assert Q._CODE_CHANGED_IN == {
        n: max(r for m, r in Q._CODE_CHANGES if m == n)
        for n, _ in Q._CODE_CHANGES
    }
    # the list legitimately repeats names; the merged view never does
    assert len(Q._CODE_CHANGED_IN) <= len(Q._CODE_CHANGES)


def test_manifest_rows_inside_window_until_certified():
    """While a changed-code flag is live, the row must sort ahead of
    every ordinary stale row EXCEPT the reserved-floor rows. Window
    membership is asserted only while capacity (window - floor)
    allows."""
    latest, order, group = _groups()
    pos = {n: i for i, n in enumerate(order)}
    live = [
        n for n, rnd in Q._CODE_CHANGED_IN.items()
        if latest.get(n) is None or latest[n] < rnd
    ]
    n_priority = sum(1 for n in order if group(n) in (0, 1))
    if n_priority <= Q._WINDOW - Q._STALE_FLOOR:
        first_stale = min(
            (pos[n] for n in order if group(n) == 2), default=len(order)
        )
        for name in live:
            if group(name) == 1:
                assert pos[name] < first_stale, (
                    f"{name}: live changed-code row sorted after a stale row"
                )
                assert name in set(order[: Q._WINDOW])


# ---------------------------------------------------------------------
# Pure-policy tests: drive _ordered_names with synthetic inputs so the
# floor's behavior is pinned independently of the repo's live artifacts.
# ---------------------------------------------------------------------

def _mk(n_never=0, n_changed=0, n_green=0):
    names, latest, changed = [], {}, {}
    for i in range(n_never):
        names.append(f"nv{i:03d}")
    for i in range(n_changed):
        nm = f"ch{i:03d}"
        names.append(nm)
        latest[nm] = 5
        changed[nm] = 9
    for i in range(n_green):
        nm = f"gr{i:03d}"
        names.append(nm)
        latest[nm] = i  # gr000 is the stalest
    return names, latest, changed


def test_floor_engages_when_flags_overflow_the_window():
    """62 flags (the r15 situation) + 100 green rows: the 6 stalest
    green rows still land inside the 50-slot window."""
    names, latest, changed = _mk(n_changed=62, n_green=100)
    out = Q._ordered_names(names, latest, changed, window=50, floor=6)
    window = out[:50]
    assert window[:44] == [f"ch{i:03d}" for i in range(44)]
    assert window[44:] == [f"gr{i:03d}" for i in range(6)]
    # excess flags queue immediately after, then the remaining greens
    assert out[50:68] == [f"ch{i:03d}" for i in range(44, 62)]
    assert out[68:] == [f"gr{i:03d}" for i in range(6, 100)]


def test_floor_idle_when_priority_fits():
    """44 or fewer priority rows: pure three-group ordering, no
    interleave."""
    names, latest, changed = _mk(n_never=4, n_changed=40, n_green=60)
    out = Q._ordered_names(names, latest, changed, window=50, floor=6)
    assert out[:4] == [f"nv{i:03d}" for i in range(4)]
    assert out[4:44] == [f"ch{i:03d}" for i in range(40)]
    assert out[44:] == [f"gr{i:03d}" for i in range(60)]


def test_floor_counts_never_checked_rows_as_priority():
    """Group 0 rows consume priority capacity too — the floor guards
    against ANY oversized priority batch, not just flags."""
    names, latest, changed = _mk(n_never=50, n_green=20)
    out = Q._ordered_names(names, latest, changed, window=50, floor=6)
    assert out[:44] == [f"nv{i:03d}" for i in range(44)]
    assert out[44:50] == [f"gr{i:03d}" for i in range(6)]
    assert out[50:56] == [f"nv{i:03d}" for i in range(44, 50)]


def test_floor_with_fewer_green_rows_than_floor():
    """Degenerate: 3 green rows, floor 6 — all greens enter the window,
    no crash, no duplicates."""
    names, latest, changed = _mk(n_changed=60, n_green=3)
    out = Q._ordered_names(names, latest, changed, window=50, floor=6)
    assert sorted(out) == sorted(names)
    assert len(out) == len(set(out))
    window = out[:50]
    assert all(g in window for g in ("gr000", "gr001", "gr002"))


def test_floor_preserves_the_full_registry():
    """Whatever the mix, the rotation is a permutation — every row
    appears exactly once."""
    for kwargs in (
        dict(n_never=10, n_changed=55, n_green=200),
        dict(n_changed=200, n_green=5),
        dict(n_green=300),
    ):
        names, latest, changed = _mk(**kwargs)
        out = Q._ordered_names(names, latest, changed)
        assert sorted(out) == sorted(names)
