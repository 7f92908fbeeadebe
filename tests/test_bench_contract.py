"""The driver records the LAST 2000 characters of bench.py's stdout and
parses the JSON line it finds there (BENCH_r08.json: `tail` length exactly
2000, starting mid-line → parsed:null). These tests pin the output
contract so the headline metric is never lost to truncation again:
compact_line() must stay under LINE_BUDGET (1900 = 2000 − margin) for any
query-map size, stay valid JSON, and always carry the headline value +
streaming numbers."""

import json

import bench


def test_headline_line_under_budget_real_shape():
    # 86 realistic query names (the r8 HEADLINE list) with plausible values
    timings = {name: 0.25 + (i % 17) * 0.37 for i, name in enumerate(bench.HEADLINE)}
    line = bench.compact_line(96.04, timings, 8.292, 6.613, 0.1)
    assert len(line) <= bench.LINE_BUDGET
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total_wall"
    assert d["value"] == 96.04
    assert d["streaming_minutely_batch"] == 8.292
    assert d["streaming_tile_batch"] == 6.613
    assert d["sf"] == 0.1
    # greedy fill: included + omitted == total, and the included entries
    # are the most expensive ones (the round-over-round perf signal)
    assert len(d["queries"]) + d["queries_omitted"] == len(timings)
    if d["queries_omitted"]:
        included_min = min(d["queries"].values())
        omitted = {k: v for k, v in timings.items() if k not in d["queries"]}
        assert max(omitted.values()) <= included_min + 0.005


def test_headline_line_under_budget_adversarial_sizes():
    for n in (0, 1, 86, 500):
        timings = {f"query_with_a_really_long_name_{i:05d}": 123.456 for i in range(n)}
        line = bench.compact_line(9.9, timings, 1.0, 1.0, 0.01)
        assert len(line) <= bench.LINE_BUDGET, n
        d = json.loads(line)
        assert d["value"] == 9.9
        assert len(d["queries"]) + d["queries_omitted"] == n


def test_budget_leaves_margin_under_driver_capture_window():
    # the driver window is 2000; the budget must leave real margin for a
    # trailing newline / stray log bleed
    assert bench.LINE_BUDGET <= 1900


def test_headline_names_resolve_in_registry():
    """bench.py indexes the registry by HEADLINE name at run time — a
    renamed or removed query would KeyError in the driver's bench run,
    which surfaces as a parsed:null round. Also reject duplicates (a
    duplicate entry double-counts its median in the headline total)."""
    from osmesa_spark import queries as Q

    reg = Q.registry()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    dupes = {n for n in bench.HEADLINE if bench.HEADLINE.count(n) > 1}
    assert not dupes, f"duplicate HEADLINE entries: {dupes}"
