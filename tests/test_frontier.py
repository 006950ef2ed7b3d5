"""Frontier-schedule invariants: dense per-host slots, robots-blocked
paths absent, the politeness arithmetic."""

from __future__ import annotations

from orionld_to_hive_spark.operators.frontier import crawl_frontier_schedule

SF = "/root/testdata/sf0.001"


def test_slots_are_dense_per_host_and_offsets_match(spark):
    rows = crawl_frontier_schedule(spark, SF).collect()
    assert rows
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
        assert r.fetch_offset_ms == (r.slot - 1) * 500
        assert r.loc.startswith(f"https://{r.host}/p/")
    for host, hr in by_host.items():
        slots = sorted(r.slot for r in hr)
        assert slots == list(range(1, len(hr) + 1)), host  # dense, no dups
        # priority order within the host: slot order == (priority desc, loc)
        ordered = sorted(hr, key=lambda r: (-float(r.priority), r.loc))
        assert [r.slot for r in ordered] == slots, host


def test_robots_blocked_slots_are_absent(spark):
    rows = crawl_frontier_schedule(spark, SF).collect()
    for r in rows:
        i = int(r.loc.rsplit("/", 1)[1])
        assert i not in (2, 4), r.loc  # the two fixture disallow rules


def test_nested_frontier_blocked_u_absent_and_dense(spark):
    from orionld_to_hive_spark.operators.frontier import (
        frontier_from_sitemap_index,
    )

    rows = frontier_from_sitemap_index(spark, SF).collect()
    assert rows
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
        u = int(r.loc.rsplit("/", 1)[1])
        assert u != 1, r.loc  # the host rule /p/*/1$ blocks u=1
        assert r.fetch_offset_ms == (r.slot - 1) * 500
    for host, hr in by_host.items():
        slots = sorted(r.slot for r in hr)
        assert slots == list(range(1, len(hr) + 1)), host


def test_crawl_delay_schedule_arithmetic(spark):
    from orionld_to_hive_spark.operators.frontier import (
        frontier_crawl_delay_schedule,
    )

    rows = frontier_crawl_delay_schedule(spark, SF).collect()
    assert rows
    for r in rows:
        digit = int(r.host.split("-")[1].split(".")[0])
        assert r.crawl_delay_s == 1 + digit % 4, r.host
        assert r.fetch_offset_ms == (r.slot - 1) * r.crawl_delay_s * 1000
        i = int(r.loc.rsplit("/", 1)[1])
        assert i != 2, r.loc  # the single disallow rule
