"""Unit tests for the bench.py sf1 outlier-guard policy (pure functions,
no Spark). The r13/r14 lesson: guard bugs cost a full round of perf
evidence — BENCH_r13's headline was 3x-contaminated because no guard
existed, and BENCH_r14's sf1 section carried an unflagged 15.3s outlier
because the guard was seeded from a single fresh run instead of the
historical minima. These tests pin the corrected policy:

  - priors merge MIN-wise across every source (committed history file,
    last sidecar's sf1_best and sf1_queries), ignoring junk;
  - the re-run trigger is >3x the rolling best AND above a RELATIVE
    floor max(0.5, 2*best) — not the r14 flat 2.0s floor that exempted
    q6-sized queries;
  - single-shot readings enter the history only via the min-merge.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    SF1_HISTORY_FILE,
    load_sf1_history,
    merge_sf1_priors,
    preflight_quiet_wait,
    save_sf1_history,
    should_rerun_sf1,
)


class TestMergeSf1Priors:
    def test_min_wise_across_maps(self):
        out = merge_sf1_priors({"q1": 0.6, "q2": 3.0}, {"q1": 0.5, "q3": 1.0}, {"q2": 2.5})
        assert out == {"q1": 0.5, "q2": 2.5, "q3": 1.0}

    def test_none_and_non_dict_inputs_skipped(self):
        assert merge_sf1_priors(None, "junk", 7, {"q1": 1.0}) == {"q1": 1.0}

    def test_junk_values_ignored_per_query(self):
        out = merge_sf1_priors({"q1": "oops", "q2": None, "q3": -1, "q4": 0, "q5": 2.0})
        assert out == {"q5": 2.0}

    def test_near_zero_prior_rejected(self):
        # A 1ms prior (instant-error run) would force a re-run of that
        # query every round; the 0.02s sanity floor rejects it.
        out = merge_sf1_priors({"q1": 0.001}, {"q1": 3.0})
        assert out == {"q1": 3.0}

    def test_string_numbers_coerced(self):
        assert merge_sf1_priors({"q1": "1.5"}) == {"q1": 1.5}

    def test_fresh_run_cannot_raise_an_existing_best(self):
        # The r14 failure: a fresh 8.60s seed replaced the 3.49s
        # historical best. Min-merge makes that impossible.
        out = merge_sf1_priors({"dd_embedding_neardup": 3.49}, {"dd_embedding_neardup": 8.60})
        assert out["dd_embedding_neardup"] == 3.49


class TestShouldRerunSf1:
    def test_r14_outlier_fires_with_historical_seed(self):
        # 15.29s vs the 3.49s all-time best: 4.4x -> re-run.
        assert should_rerun_sf1(15.29, 3.49)

    def test_r14_outlier_missed_with_blind_seed(self):
        # ...but vs the single fresh 8.60s seed it was 1.78x and sailed
        # under. Documents WHY the history merge matters.
        assert not should_rerun_sf1(15.29, 8.60)

    def test_q6_sized_query_now_guarded(self):
        # r14's flat 2.0s absolute floor exempted q6 (1.54s vs 0.243s
        # best = 6.3x, no re-run). The relative floor catches it.
        assert should_rerun_sf1(1.54, 0.243)

    def test_sub_half_second_jitter_ignored(self):
        # 0.4s vs a 0.1s best is 4x but under the 0.5s floor: noise.
        assert not should_rerun_sf1(0.4, 0.1)

    def test_trigger_edge_is_three_x(self):
        # t must exceed both 3*p and the 0.5s jitter floor; with p=0.3
        # the binding edge is 3*p=0.9.
        assert not should_rerun_sf1(0.85, 0.3)
        assert should_rerun_sf1(0.95, 0.3)

    def test_within_band_never_reruns(self):
        assert not should_rerun_sf1(5.0, 3.8)  # 1.3x

    def test_no_prior_no_rerun(self):
        assert not should_rerun_sf1(100.0, None)
        assert not should_rerun_sf1(100.0, "junk")
        assert not should_rerun_sf1(100.0, 0)


class TestStealStamp:
    def test_read_steal_ticks_monotone_nonneg(self):
        from bench import read_steal_ticks

        a = read_steal_ticks()
        b = read_steal_ticks()
        assert isinstance(a, int) and a >= 0
        assert b >= a

    def test_read_cpu_ticks_busy_and_steal(self):
        from bench import read_cpu_ticks

        busy_a, steal_a = read_cpu_ticks()
        busy_b, steal_b = read_cpu_ticks()
        assert busy_a >= 0 and steal_a >= 0
        assert busy_b >= busy_a and steal_b >= steal_a


class TestStealGuard:
    """sf0.1 steal trigger (r15 verdict #2): the guard must act on the
    steal stamp DURING the run, not leave it to post-hoc adjudication.
    Ratio is steal/(busy+steal) — scheduled-cpu-relative, since Spark
    rarely saturates all 32 cores and a wall-capacity ratio would
    understate contention several-fold."""

    def test_r15_calibration_level_contention_fires(self):
        from bench import steal_guard_reason

        # the r15 calibration burn: ~21% of scheduled cpu stolen
        reason = steal_guard_reason(21.0, 79.0)
        assert reason is not None and "21%" in reason

    def test_quiet_run_passes(self):
        from bench import steal_guard_reason

        assert steal_guard_reason(1.5, 300.0) is None  # 0.5%

    def test_edge_is_ten_percent_of_scheduled_cpu(self):
        from bench import steal_guard_reason

        assert steal_guard_reason(9.9, 90.1) is None  # 9.9%
        assert steal_guard_reason(10.2, 89.8) is not None  # 10.2%

    def test_absolute_floor_ignores_tiny_deltas(self):
        from bench import steal_guard_reason

        # 50% ratio but under the 2 cpu-sec floor: division noise
        assert steal_guard_reason(1.0, 1.0) is None

    def test_zero_denominator_safe(self):
        from bench import steal_guard_reason

        assert steal_guard_reason(0.0, 0.0) is None

    def test_custom_limit_env_path(self):
        from bench import steal_guard_reason

        # bench passes PG_LAKE_BENCH_STEAL_LIMIT through as limit=
        assert steal_guard_reason(5.0, 95.0, limit=0.04) is not None
        assert steal_guard_reason(5.0, 95.0, limit=0.06) is None


class TestSubSuiteGuard:
    """contaminated_suites: the sub-suite arm of the steal guard."""

    def test_picks_only_storm_hit_suites(self):
        from bench import contaminated_suites

        stamps = {
            "dml": (30.0, 70.0),  # 30% — storm
            "spatial": (0.5, 99.5),  # quiet
            "pipeline": (12.0, 88.0),  # 12% — storm
            "tpcds": (1.0, 1.0),  # 50% ratio but under the 2s floor
        }
        assert contaminated_suites(stamps) == ["dml", "pipeline"]

    def test_quiet_run_reruns_nothing(self):
        from bench import contaminated_suites

        stamps = {label: (0.3, 60.0) for label in ("dml", "spatial", "pipeline", "tpcds")}
        assert contaminated_suites(stamps) == []

    def test_limit_passes_through(self):
        from bench import contaminated_suites

        stamps = {"dml": (5.0, 95.0)}
        assert contaminated_suites(stamps, limit=0.04) == ["dml"]
        assert contaminated_suites(stamps, limit=0.06) == []


class TestRoundArchive:
    """next_round_number: numbers the per-round BENCH_DETAIL archive
    (r17, VERDICT r16 #1 — adjudication data must survive the rolling
    sidecar's overwrite)."""

    def test_next_after_highest_artifact(self, tmp_path):
        from bench import next_round_number

        for n in (1, 7, 16):
            (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
        assert next_round_number(str(tmp_path)) == 17

    def test_unpadded_round_numbers_accepted(self, tmp_path):
        from bench import next_round_number

        (tmp_path / "BENCH_r9.json").write_text("{}")
        assert next_round_number(str(tmp_path)) == 10

    def test_no_artifacts_returns_none(self, tmp_path):
        from bench import next_round_number

        assert next_round_number(str(tmp_path)) is None

    def test_core_count_suffixed_artifacts_ignored(self, tmp_path):
        # the driver's 8-core scaling artifact (BENCH_r16_c8.json) is
        # not a round marker
        from bench import next_round_number

        (tmp_path / "BENCH_r16.json").write_text("{}")
        (tmp_path / "BENCH_r16_c8.json").write_text("{}")
        assert next_round_number(str(tmp_path)) == 17


class TestWorkerWarm:
    def test_warm_python_workers_runs_and_restores_conf(self, spark):
        from pg_lake_spark.session import warm_python_workers

        key = "spark.sql.adaptive.coalescePartitions.enabled"
        prior = spark.conf.get(key, "true")
        dt = warm_python_workers(spark, workers=4)
        assert dt >= 0.0
        assert spark.conf.get(key, "true") == prior


class TestHistoryFile:
    def test_roundtrip(self, tmp_path):
        save_sf1_history(str(tmp_path), {"q1": 1.23456, "q2": 0.5})
        got = load_sf1_history(str(tmp_path))
        assert got == {"q1": 1.2346, "q2": 0.5}
        # note preserved on rewrite
        obj = json.loads((tmp_path / SF1_HISTORY_FILE).read_text())
        assert "_note" in obj and "min-merge" in obj["_note"]

    def test_load_missing_or_corrupt(self, tmp_path):
        assert load_sf1_history(str(tmp_path)) == {}
        (tmp_path / SF1_HISTORY_FILE).write_text("{not json")
        assert load_sf1_history(str(tmp_path)) == {}
        (tmp_path / SF1_HISTORY_FILE).write_text('{"sf1_min": [1,2]}')
        assert load_sf1_history(str(tmp_path)) == {}

    def test_update_cycle_only_improves(self, tmp_path):
        here = str(tmp_path)
        save_sf1_history(here, {"q1": 2.0})
        # a later, slower run folds in min-wise: q1 keeps its best,
        # new query q2 enters
        merged = merge_sf1_priors(load_sf1_history(here), {"q1": 9.0, "q2": 4.0})
        save_sf1_history(here, merged)
        assert load_sf1_history(here) == {"q1": 2.0, "q2": 4.0}

    def test_committed_seed_is_loadable_and_sane(self):
        # The repo-root seed written in r15 from historical artifacts.
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        hist = load_sf1_history(here)
        assert len(hist) >= 20
        # the r14 outlier's query must be seeded at its historical best,
        # not the contaminated 8.6/15.3 readings
        assert hist["dd_embedding_neardup"] <= 5.7
        assert all(v >= 0.02 for v in hist.values())


class TestPreflightQuietWait:
    """The bounded pre-flight wait (r16): don't START the headline loop
    inside a steal storm the single guarded re-run can't escape."""

    def _run(self, fracs, budget=90.0):
        probes = iter(fracs)
        slept: list[float] = []
        waited, frac = preflight_quiet_wait(
            lambda _s: next(probes),
            slept.append,
            budget_s=budget,
        )
        return waited, frac, slept

    def test_quiet_box_proceeds_immediately(self):
        waited, frac, slept = self._run([0.02])
        assert slept == [] and frac == 0.02 and waited == 1.0

    def test_storm_then_quiet_waits_once(self):
        waited, frac, slept = self._run([0.40, 0.05])
        assert slept == [10.0] and frac == 0.05
        assert waited == 12.0  # two probes + one sleep

    def test_sustained_storm_stops_at_budget(self):
        # every probe hot: the wait must exhaust the budget, not spin
        waited, frac, slept = self._run([0.5] * 50, budget=35.0)
        assert frac == 0.5
        # 1s probe + n*(10s sleep + 1s probe) <= 35 -> n == 3
        assert slept == [10.0] * 3
        assert waited == 34.0

    def test_boundary_frac_is_not_a_storm(self):
        # exactly the limit does not trigger waiting (strict >)
        waited, frac, slept = self._run([0.10])
        assert slept == [] and waited == 1.0
