"""The bench regression budgets are machine-checked (r12, judge r11
ask #3): ``bench.check_budgets`` must trip on each violation class the
PLANS.md prose used to track by hand, and stay silent on a clean
artifact shaped like the committed r11 median pass."""

from __future__ import annotations

import bench


def _clean_result() -> dict:
    return {
        "queries": dict(bench.BUDGET_MEDIANS),
        "stream_state": {
            # r15 steady state (core-sized partitions): 22-27 s/provider
            "hdfs": {"t_replay": 26.2, "state_rows": 50_000},
            "rocksdb": {"t_replay": 24.5, "state_rows": 50_000},
        },
        "close_10m": {
            "uniform": {"t_close": 30.0, "verify": {"ok": True, "kpi_cells_match": True}},
            "skew": {"t_close": 31.0, "verify": {"ok": True, "kpi_cells_match": True}},
            "lakefed": {"t_close": 25.0, "verify": {"ok": True, "kpi_cells_match": True}},
            "skew_ratio": 1.03,
        },
        # r16 steady state (single-transform argmin): hof 3.5-3.7
        "kmeans_k64": {"hof": 3.6, "arrow": 1.1, "max_centroid_delta": 0.0},
        "ann_1m": {
            "ann_1m_ivf": {
                "t_build_lloyd_k64": 2.5, "t_probe_nprobe8": 1.24, "recall_at_10": 0.9812,
            },
            "ann_1m_lsh": {
                "t_probe_12planes": 8.6, "recall_at_10": 1.0,
                "t_probe_12planes_arrow": 0.72, "recall_at_10_arrow": 0.9938,
            },
            # r15 lanes (probe/rerank budgeted; encode deliberately not)
            "ann_1m_pq": {
                "t_encode": 7.7, "t_probe_adc": 0.88, "recall_at_10_adc": 0.1,
                "t_probe_rerank2000": 4.08, "recall_at_10_rerank": 1.0,
            },
            "ann_1m_ivfpq": {
                "t_encode": 4.4, "t_probe_adc": 1.51, "recall_at_10_adc": 0.1,
                "t_probe_rerank2000": 4.7, "recall_at_10_rerank": 1.0,
            },
        },
    }


def test_clean_result_has_no_violations():
    assert bench.check_budgets(_clean_result()) == []


def test_headline_regression_trips():
    r = _clean_result()
    base = bench.R11_HEADLINE_MEDIANS["flagship_revenue_by_month"]
    r["queries"]["flagship_revenue_by_month"] = (
        base * bench.HEADLINE_REGRESSION_RATIO + bench.HEADLINE_REGRESSION_GRACE_S + 0.01
    )
    v = bench.check_budgets(r)
    assert len(v) == 1 and "flagship_revenue_by_month" in v[0] and "budget" in v[0]


def test_headline_within_grace_does_not_trip():
    r = _clean_result()
    base = bench.R11_HEADLINE_MEDIANS["docs_fingerprint"]
    # 1.25x alone would flag this sub-second query; the absolute grace
    # absorbs it (scheduler noise on a 0.24 s query is not a regression)
    r["queries"]["docs_fingerprint"] = base * 1.3
    assert bench.check_budgets(r) == []


def test_missing_headline_row_trips():
    r = _clean_result()
    del r["queries"]["pricing_summary"]
    v = bench.check_budgets(r)
    assert len(v) == 1 and "pricing_summary" in v[0] and "no timing row" in v[0]


def test_stream_state_budget_trips():
    r = _clean_result()
    r["stream_state"]["rocksdb"]["t_replay"] = bench.STREAM_STATE_BUDGET_S + 1
    v = bench.check_budgets(r)
    assert len(v) == 1 and "rocksdb" in v[0] and "t_replay" in v[0]


def test_stream_state_rows_trips():
    r = _clean_result()
    r["stream_state"]["hdfs"]["state_rows"] = 49_999
    v = bench.check_budgets(r)
    assert len(v) == 1 and "state_rows" in v[0]


def test_close_verify_failure_trips():
    r = _clean_result()
    r["close_10m"]["skew"]["verify"] = {"ok": False, "kpi_cells_match": False}
    v = bench.check_budgets(r)
    assert len(v) == 1 and "close_10m:skew" in v[0] and "kpi_cells_match" in v[0]


def test_absent_tiers_do_not_trip():
    # SPARK_GRAFT_SKIP_VOLUME / SKIP_CLOSE runs omit whole tiers; the
    # budgets only judge what the pass actually measured
    r = {"queries": dict(bench.BUDGET_MEDIANS)}
    assert bench.check_budgets(r) == []


# --- full-coverage budgets (r14, judge r13 ask #1) -------------------------
# The r13 drift (docs_ngram_jaccard_recall 1.42 -> 3.09 s) sailed through
# because only the 13 headline queries had budgets; every timed query now
# has one, baselined on the steady-state r12 medians.


def test_heavy_tier_regression_trips():
    r = _clean_result()
    base = bench.R12_HEAVY_MEDIANS["docs_ngram_jaccard_recall"]
    # the exact r13 drift value: 3.087 s against the 1.421 s r12 median
    r["queries"]["docs_ngram_jaccard_recall"] = 3.087
    assert base * bench.HEADLINE_REGRESSION_RATIO + bench.HEADLINE_REGRESSION_GRACE_S < 3.087
    v = bench.check_budgets(r)
    assert len(v) == 1 and v[0].startswith("heavy:docs_ngram_jaccard_recall")


def test_missing_heavy_row_trips():
    r = _clean_result()
    del r["queries"]["events_user_sessions_udtf"]
    v = bench.check_budgets(r)
    assert len(v) == 1 and "events_user_sessions_udtf" in v[0] and "no timing row" in v[0]


def test_every_timed_query_has_a_budget():
    assert set(bench.BUDGET_MEDIANS) == set(bench.HEADLINE) | set(bench.HEAVY)


def test_py_seam_queries_get_wider_grace():
    # audio_features at 1.88 s (a real r14 exclusive capture value) is
    # inside the seam budget (1.176 x 1.25 + 0.8 = 2.27) but would trip
    # the pure-JVM grace; a genuine 2x regression still trips
    r = _clean_result()
    r["queries"]["audio_features"] = 1.88
    assert bench.check_budgets(r) == []
    r["queries"]["audio_features"] = 2.4
    v = bench.check_budgets(r)
    assert len(v) == 1 and "audio_features" in v[0] and "0.8s grace" in v[0]


def test_close_t_close_budget_trips():
    r = _clean_result()
    r["close_10m"]["lakefed"]["t_close"] = bench.CLOSE_BUDGET_S["lakefed"] + 1
    v = bench.check_budgets(r)
    assert len(v) == 1 and "close_10m:lakefed" in v[0] and "t_close" in v[0]


def test_close_skew_ratio_budget_trips():
    r = _clean_result()
    r["close_10m"]["skew_ratio"] = 2.4
    v = bench.check_budgets(r)
    assert len(v) == 1 and "skew_ratio" in v[0]


def test_kmeans_k64_budget_trips():
    r = _clean_result()
    r["kmeans_k64"]["arrow"] = bench.KMEANS_K64_BUDGET_S["arrow"] + 0.5
    v = bench.check_budgets(r)
    assert len(v) == 1 and "kmeans_k64:arrow" in v[0]


def test_kmeans_centroid_divergence_trips():
    r = _clean_result()
    r["kmeans_k64"]["max_centroid_delta"] = 0.01
    v = bench.check_budgets(r)
    assert len(v) == 1 and "max_centroid_delta" in v[0]


def test_ann_recall_floor_trips():
    r = _clean_result()
    r["ann_1m"]["ann_1m_ivf"]["recall_at_10"] = 0.91
    v = bench.check_budgets(r)
    assert len(v) == 1 and "ivf recall_at_10" in v[0] and "<" in v[0]


def test_ann_probe_time_budget_trips():
    r = _clean_result()
    r["ann_1m"]["ann_1m_lsh"]["t_probe_12planes_arrow"] = 9.0
    v = bench.check_budgets(r)
    assert len(v) == 1 and "t_probe_12planes_arrow" in v[0]


def test_pq_lane_budgets_trip_and_encode_is_unbudgeted():
    # r15: probe/rerank/recall budgets on the PQ and IVF-PQ lanes; a
    # broken rerank (recall below the pinned 1.0) and a slow ADC probe
    # both flag, while an encode blowup alone stays silent (the
    # py-worker numpy family's same-code swing is 5.3-21.7 s).
    r = _clean_result()
    r["ann_1m"]["ann_1m_pq"]["t_encode"] = 25.0
    assert bench.check_budgets(r) == []
    r["ann_1m"]["ann_1m_pq"]["recall_at_10_rerank"] = 0.9
    v = bench.check_budgets(r)
    assert len(v) == 1 and "pq recall_at_10_rerank" in v[0]
    r = _clean_result()
    r["ann_1m"]["ann_1m_ivfpq"]["t_probe_adc"] = 5.0
    v = bench.check_budgets(r)
    assert len(v) == 1 and "ivfpq t_probe_adc" in v[0]


# --- cross-pass effective budget view (r14) --------------------------------
# A code regression is slow in EVERY pass; box/VM-host noise is not.
# Multi-pass captures gate timings on the cross-pass min and
# correctness fields on the worst pass.


def _three_pass_result() -> dict:
    base = _clean_result()
    runs = [
        {**{k: v for k, v in _clean_result().items()}, "value": 8.0},
        {**{k: v for k, v in _clean_result().items()}, "value": 8.2},
        {**{k: v for k, v in _clean_result().items()}, "value": 8.4},
    ]
    base["runs"] = runs
    return base


def test_single_pass_gates_on_run_min():
    # the driver's per-round capture has no cross-pass samples; it
    # gates each query on the fastest of its 3 runs (spread[0])
    r = _clean_result()
    r["queries"]["docs_quality"] = 1.432  # noisy median...
    r["spread"] = {"docs_quality": [0.65, 2.3]}  # ...but one steady run
    assert bench.check_budgets(bench.effective_budget_view(r)) == []
    # a systematic slowdown raises the min too and still trips
    r["spread"]["docs_quality"] = [2.2, 2.4]
    v = bench.check_budgets(bench.effective_budget_view(r))
    assert len(v) == 1 and "docs_quality" in v[0]


def test_single_pass_close_keeps_repeat_median():
    # the close's t_close stays the median of --repeats: repeats 2..n
    # run warm in the same subprocess JVM, so a min would be compared
    # against cold-calibrated budgets and mask cold-path regressions
    r = _clean_result()
    r["close_10m"]["uniform"]["t_close"] = 90.0
    r["close_10m"]["uniform"]["t_run_month_runs"] = [90.0, 30.0, 95.0]
    v = bench.check_budgets(bench.effective_budget_view(r))
    assert len(v) == 1 and "close_10m:uniform" in v[0] and "t_close" in v[0]


def test_multi_pass_skew_ratio_from_effective_closes():
    # a skew regression systematic in every pass must trip even when
    # one pass's uniform close caught box noise (which would have
    # flattered a min-over-per-pass-ratios gate)
    r = _three_pass_result()
    for i, (u, s) in enumerate([(30.0, 75.0), (90.0, 76.0), (31.0, 78.0)]):
        r["runs"][i]["close_10m"] = {
            "uniform": {"t_close": u, "verify": {"ok": True}},
            "skew": {"t_close": s, "verify": {"ok": True}},
            "skew_ratio": round(s / u, 3),
        }
    v = bench.check_budgets(bench.effective_budget_view(r))
    # effective: uniform 30.0, skew 75.0 -> ratio 2.5 trips; skew 75 > 45 budget also trips
    assert any("skew_ratio" in x for x in v)


def test_noise_in_one_pass_does_not_trip():
    r = _three_pass_result()
    # the committed median pass carries the real r14 noise value...
    r["queries"]["docs_quality"] = 1.432
    r["runs"][0]["queries"] = dict(r["queries"])
    # ...but another pass ran it at steady state
    r["runs"][2]["queries"]["docs_quality"] = 0.646
    assert bench.check_budgets(bench.effective_budget_view(r)) == []


def test_systematic_regression_still_trips():
    r = _three_pass_result()
    for run in [r] + r["runs"]:
        run["queries"] = dict(run["queries"])
        run["queries"]["docs_quality"] = 2.5
    v = bench.check_budgets(bench.effective_budget_view(r))
    assert len(v) == 1 and "docs_quality" in v[0]


def test_verify_failure_in_any_pass_trips():
    r = _three_pass_result()
    r["runs"][1]["close_10m"] = {
        "uniform": {"t_close": 30.0, "verify": {"ok": False, "kpi_cells_match": False}},
    }
    v = bench.check_budgets(bench.effective_budget_view(r))
    assert len(v) == 1 and "close_10m:uniform" in v[0] and "verify" in v[0]


def test_recall_floor_checks_worst_pass():
    r = _three_pass_result()
    r["runs"][2]["ann_1m"] = {
        "ann_1m_ivf": {"t_probe_nprobe8": 1.0, "recall_at_10": 0.5},
        "ann_1m_lsh": dict(r["ann_1m"]["ann_1m_lsh"]),
    }
    v = bench.check_budgets(bench.effective_budget_view(r))
    assert len(v) == 1 and "ivf recall_at_10" in v[0]


def test_close_timing_takes_best_pass():
    r = _three_pass_result()
    r["runs"][0]["close_10m"] = {
        "uniform": {"t_close": 90.0, "verify": {"ok": True}}}
    r["runs"][1]["close_10m"] = {
        "uniform": {"t_close": 30.0, "verify": {"ok": True}}}
    assert bench.check_budgets(bench.effective_budget_view(r)) == []


# --- contamination adjudication (r13, judge r12 ask #2) --------------------


def _violating_result(
    boot_load1: float, boot_java: int, pass_java: int = 1
) -> dict:
    r = _clean_result()
    r["queries"]["flagship_revenue_by_month"] = 99.0
    r["regressions"] = bench.check_budgets(r)
    r["load_fingerprint_boot"] = {
        "cpus": 32, "loadavg_1_5_15": [boot_load1, 0.0, 0.0], "n_java_procs": boot_java,
    }
    # pass-start fingerprint is taken with the bench's OWN session JVM
    # alive (and its own prior-pass loadavg draining): n_java >= 1 and
    # a high loadavg here must NOT count as contamination by themselves
    r["load_fingerprint"] = {
        "start": {"cpus": 32, "loadavg_1_5_15": [25.0, 0.0, 0.0], "n_java_procs": pass_java},
        "end": {},
    }
    return r


def test_violation_on_loaded_boot_is_contaminated():
    r = _violating_result(boot_load1=12.86, boot_java=0)
    v = bench.adjudicate_regressions(r)
    assert len(v) == 1
    assert v[0]["verdict"] == "contaminated_capture"
    assert "boot loadavg1 12.86" in v[0]["reason"]
    assert v[0]["boot_loadavg1"] == 12.86


def test_violation_with_foreign_jvm_at_boot_is_contaminated():
    r = _violating_result(boot_load1=1.0, boot_java=1)
    v = bench.adjudicate_regressions(r)
    assert v[0]["verdict"] == "contaminated_capture"
    assert "foreign java proc(s) at boot" in v[0]["reason"]


def test_violation_with_foreign_jvm_at_pass_start_is_contaminated():
    r = _violating_result(boot_load1=1.0, boot_java=0, pass_java=2)
    v = bench.adjudicate_regressions(r)
    assert v[0]["verdict"] == "contaminated_capture"
    assert "foreign java proc(s) at pass start" in v[0]["reason"]


def test_own_jvm_and_own_pass_load_do_not_contaminate():
    # the r13 self-confounding regression test: our own session JVM
    # (pass n_java == 1) and our own prior pass's loadavg (pass start
    # 25.0) are NOT foreign signals -- quiet boot means clean verdict
    r = _violating_result(boot_load1=1.2, boot_java=0, pass_java=1)
    v = bench.adjudicate_regressions(r)
    assert v[0]["verdict"] == "clean_capture"


def test_clean_result_has_empty_verdicts():
    r = _clean_result()
    r["regressions"] = bench.check_budgets(r)
    r["load_fingerprint_boot"] = {"loadavg_1_5_15": [20.0, 0, 0], "n_java_procs": 3}
    # contaminated machine but NO violations -> nothing to adjudicate
    assert bench.adjudicate_regressions(r) == []


def test_wait_for_quiet_machine_drains_then_proceeds():
    loads = iter([12.0, 9.5, 3.0])
    slept = []
    waited = bench.wait_for_quiet_machine(
        max_wait_s=60.0,
        poll_s=10.0,
        _sleep=slept.append,
        _fingerprint=lambda: {"loadavg_1_5_15": [next(loads), 0, 0]},
    )
    assert waited == 20.0 and slept == [10.0, 10.0]


def test_wait_for_quiet_machine_gives_up_at_budget():
    waited = bench.wait_for_quiet_machine(
        max_wait_s=30.0,
        poll_s=10.0,
        _sleep=lambda s: None,
        _fingerprint=lambda: {"loadavg_1_5_15": [50.0, 0, 0]},
    )
    assert waited == 30.0


def test_lakefed_close_verify_failure_trips():
    r = _clean_result()
    r["close_10m"]["lakefed"] = {"verify": {"ok": False, "kpi_cells_match": False}}
    v = bench.check_budgets(r)
    assert len(v) == 1 and "lakefed" in v[0]


# --- cold lane (r15, judge r14 ask #2) -------------------------------------
# The steady-state gate is blind to cold-only regressions; the cold lane
# budgets first-warmup totals and pass-0 totals (with a cold signature).


def _inflate(queries: dict, factor: float) -> dict:
    return {n: v * factor for n, v in queries.items()}


def test_cold_pass0_systematic_inflation_trips():
    r = _three_pass_result()
    r["runs"][0]["queries"] = _inflate(r["runs"][0]["queries"], 3.0)
    v = bench.check_cold_budgets(r)
    assert any("cold_pass0:headline" in x for x in v)
    assert any("cold_pass0:heavy" in x for x in v)
    # the steady-state lane stays clean: passes 1-2 hold the floor
    assert bench.check_budgets(bench.effective_budget_view(r)) == []


def test_cold_pass0_noise_on_later_pass_does_not_trip():
    r = _three_pass_result()
    r["runs"][1]["queries"] = _inflate(r["runs"][1]["queries"], 3.0)
    assert bench.check_cold_budgets(r) == []


def test_cold_lane_ignores_uniform_slowdown():
    # all passes equally slow is a STEADY-STATE regression: the cold
    # signature (pass0 vs best pass) keeps the cold lane out of it and
    # the regular lane trips instead -- the lanes stay orthogonal
    r = _three_pass_result()
    for run in [r] + r["runs"]:
        run["queries"] = _inflate(run["queries"], 3.0)
    assert bench.check_cold_budgets(r) == []
    assert bench.check_budgets(bench.effective_budget_view(r)) != []


def test_cold_lane_silent_on_single_pass():
    assert bench.check_cold_budgets(_clean_result()) == []


def test_cold_first_run_gates_when_baselined(monkeypatch):
    monkeypatch.setattr(
        bench, "COLD_FIRST_BASELINE_S", {"headline": 20.0, "heavy": 75.0}
    )
    r = _clean_result()
    r["cold_first_run"] = {"headline_total_s": 20.0 * bench.COLD_FIRST_RATIO + 1, "heavy_total_s": 70.0}
    v = bench.check_cold_budgets(r)
    assert len(v) == 1 and "cold_first:headline" in v[0]
    r["cold_first_run"]["headline_total_s"] = 20.0
    assert bench.check_cold_budgets(r) == []


def test_cold_first_unbaselined_records_without_gating(monkeypatch):
    monkeypatch.setattr(
        bench, "COLD_FIRST_BASELINE_S", {"headline": None, "heavy": None}
    )
    r = _clean_result()
    r["cold_first_run"] = {"headline_total_s": 9999.0, "heavy_total_s": 9999.0}
    assert bench.check_cold_budgets(r) == []


def test_cold_violations_share_the_adjudicator():
    r = _clean_result()
    r["regressions"] = []
    r["regressions_cold"] = ["cold_first:headline: synthetic"]
    vs = bench.adjudicate_regressions(r)
    assert len(vs) == 1 and vs[0]["violation"].startswith("cold_first")


def test_bimodal_regression_trips_min_of_medians():
    # ADVICE r14: a regression slow in every pass's MEDIAN whose
    # occasional fast RUN still touches the old floor must trip -- the
    # gate now takes min over per-pass medians, not per-pass run-mins
    r = _three_pass_result()
    for run in [r] + r["runs"]:
        run["queries"] = dict(run["queries"])
        run["queries"]["docs_quality"] = 2.5
        run["spread"] = {"docs_quality": [0.6, 2.6]}
    v = bench.check_budgets(bench.effective_budget_view(r))
    assert len(v) == 1 and "docs_quality" in v[0]
