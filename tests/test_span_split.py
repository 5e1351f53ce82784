"""R7 span splitters vs the reference's own golden cases
(`maintainer/split/write_bytes_splitter_test.go:54-232`,
`region_count_splitter_test.go`)."""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from ticdc_spark.plans.span_split import (
    _greedy_write_split,
    split_spans_region_count,
    split_spans_write_bytes,
    synthetic_regions,
)

REGION_SCHEMA = (
    "schema_name string, table_name string, region_idx long, "
    "start_key long, end_key long, written_bytes long"
)


def _regions(spark, written: list[int]):
    rows = [
        ("test", "t1", i, i * 10, (i + 1) * 10, w)
        for i, w in enumerate(written)
    ]
    return spark.createDataFrame(rows, REGION_SCHEMA)


# --- write-bytes greedy: goldens from write_bytes_splitter_test.go -------

def test_uniform_goldens():
    # TestSplitRegionsByWrittenKeysUniform — weights include the +1 base
    ws = [101] * 7
    assert _greedy_write_split(ws, 1) == [(0, 6, 7, 707)]
    s2 = _greedy_write_split(ws, 2)
    assert [(x[2], x[3]) for x in s2] == [(4, 404), (3, 303)]
    assert [(x[0], x[1]) for x in s2] == [(0, 3), (4, 6)]
    s3 = _greedy_write_split(ws, 3)
    assert [(x[2], x[3]) for x in s3] == [(3, 303), (3, 303), (1, 101)]
    for p in range(7, 11):
        sp = _greedy_write_split(ws, p)
        assert [(x[2], x[3]) for x in sp] == [(1, 101)] * 7


def test_hotspot_goldens():
    # TestSplitRegionsByWrittenKeysHotspot1: [100,1,100,1,1,1,100], 4 spans
    ws = [w + 1 for w in [100, 1, 100, 1, 1, 1, 100]]
    s = _greedy_write_split(ws, 4)
    assert [(x[0], x[1]) for x in s] == [(0, 0), (1, 2), (3, 5), (6, 6)]
    assert [x[3] for x in s] == [101, 103, 6, 101]
    # Hotspot2: [1000,1,1,1,100,1,99], 4 spans → [0],[1..4],[5],[6]
    ws = [w + 1 for w in [1000, 1, 1, 1, 100, 1, 99]]
    s = _greedy_write_split(ws, 4)
    assert [(x[0], x[1]) for x in s] == [(0, 0), (1, 4), (5, 5), (6, 6)]


def test_cold_goldens():
    # TestSplitRegionsByWrittenKeysCold: zeros (+1 base), 3 spans
    s = _greedy_write_split([1] * 7, 3)
    assert [(x[2], x[3]) for x in s] == [(3, 3), (3, 3), (1, 1)]
    # TestNotSplitRegionsByWrittenKeysCold: 7 spans → one region each
    s = _greedy_write_split([1] * 7, 7)
    assert [(x[2], x[3]) for x in s] == [(1, 1)] * 7
    # empty regions → empty result (splitter.split on PD miss)
    assert _greedy_write_split([], 3) == []


def test_write_bytes_dataframe(spark):
    df = split_spans_write_bytes(_regions(spark, [100, 1, 100, 1, 1, 1, 100]), 4)
    rows = df.orderBy("span_id").collect()
    assert [(r.start_key, r.end_key) for r in rows] == [
        (0, 10), (10, 30), (30, 60), (60, 70)]
    assert [r.weight for r in rows] == [101, 103, 6, 101]
    assert [r.region_count for r in rows] == [1, 2, 3, 1]


# --- region-count stepper ------------------------------------------------

def test_region_count_spans_num(spark):
    # 7 regions → 3 spans: stepper gives remain=1 fat span first: 3,2,2
    df = split_spans_region_count(_regions(spark, [1] * 7), spans_num=3)
    rows = df.orderBy("span_id").collect()
    assert [r.region_count for r in rows] == [3, 2, 2]
    # contiguity
    for a, b in zip(rows, rows[1:]):
        assert a.end_key == b.start_key


def test_region_count_threshold_skip(spark):
    # below threshold → single span over the whole range
    df = split_spans_region_count(
        _regions(spark, [1] * 7), region_count_per_span=2, region_threshold=10
    )
    rows = df.collect()
    assert len(rows) == 1
    assert (rows[0].start_key, rows[0].end_key) == (0, 70)
    # threshold crossed → ceil(7/2)=4 spans, remainder spans first
    df2 = split_spans_region_count(
        _regions(spark, [1] * 7), region_count_per_span=2, region_threshold=5
    )
    counts = [r.region_count for r in df2.orderBy("span_id").collect()]
    assert sum(counts) == 7 and len(counts) == 4
    assert counts == [2, 2, 2, 1]


def test_synthetic_regions_contiguous(spark, sf_dir):
    from ticdc_spark.sources.changelog import events_changelog

    regions = synthetic_regions(events_changelog(spark, sf_dir))
    rows = regions.filter("table_name = 'tp_click'") \
        .orderBy("region_idx").collect()
    assert len(rows) > 0
    assert all(r.written_bytes > 0 for r in rows)
    assert all(r.end_key - r.start_key == 64 for r in rows)


def test_balance_invariants(spark, sf_dir):
    """Post-balance every node holds >= floor(total/n); exactly
    move_size spans moved; batch_size caps the plan."""
    from pyspark.sql import functions as F

    from ticdc_spark.plans.scheduler import balance_spans, check_balance_status
    from ticdc_spark.sink_queries import _balance_inputs

    assign, nodes = _balance_inputs(spark, sf_dir)
    plan = balance_spans(assign, nodes).cache()
    total = plan.count()
    floor_limit = total // 4
    loads_after = dict(
        plan.groupBy("node_id_after").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    # node_3 started empty and must reach the floor
    assert all(
        loads_after.get(f"node_{i}", 0) >= floor_limit for i in range(4)
    ), loads_after
    moved = plan.filter(F.col("move_rank").isNotNull())
    d = check_balance_status(assign, nodes).collect()[0]["move_size"]
    assert moved.count() == d > 0
    # movers only land on under-floor nodes, and come off loaded ones
    assert moved.filter(F.col("node_id_before") == F.col("node_id_after")
                        ).count() == 0
    # batch cap limits the number of moves
    capped = balance_spans(assign, nodes, batch_size=3)
    assert capped.filter(F.col("move_rank").isNotNull()).count() == 3


def test_balance_closed_form_matches_heap_simulation(spark):
    """The window-rank closed form must reproduce the reference's literal
    heap process (balance.go:58-146) move-for-move when victim order is
    span-id (our determinization of the reference's shuffle): same moved
    spans, same targets."""
    import heapq
    import random

    from ticdc_spark.plans.scheduler import balance_spans

    rng = random.Random(11)
    for case in range(5):
        n_nodes = rng.randint(2, 5)
        node_ids = [f"n{i}" for i in range(n_nodes)]
        spans = []
        for s in range(rng.randint(5, 40)):
            spans.append((s, rng.choice(node_ids[:max(1, n_nodes - 1)])))

        # literal simulation: min/max heaps keyed by (load, node_id);
        # victims leave each node in span-id order
        loads = {n: 0 for n in node_ids}
        per_node = {n: [] for n in node_ids}
        for s, n in spans:
            loads[n] += 1
            per_node[n].append(s)
        for n in per_node:
            per_node[n].sort()
        floor_limit = len(spans) // n_nodes
        expected_moves = {}
        while True:
            under = [n for n in node_ids if loads[n] < floor_limit]
            if not under:
                break
            target = min(under, key=lambda n: (loads[n], n))
            # max load, tie -> smallest node id (match closed form)
            best = max(loads.values())
            victim = min(n for n in node_ids if loads[n] == best)
            sp = per_node[victim].pop(0)
            expected_moves[sp] = target
            loads[victim] -= 1
            loads[target] += 1

        assign = spark.createDataFrame(spans, "span_id long, node_id string")
        nodes = spark.createDataFrame([(n,) for n in node_ids],
                                      "node_id string")
        plan = balance_spans(assign, nodes)
        got = {r["span_id"]: r["node_id_after"]
               for r in plan.filter("move_rank is not null").collect()}
        assert got == expected_moves, f"case {case}: {got} != {expected_moves}"


def test_scheduler_join_path_matches_fold_path(spark, monkeypatch):
    """Beyond LIT_FOLD_MAX_NODES the planners switch from literal CASE
    folds to broadcast joins.  Both paths must be plan-for-plan
    identical in OUTPUT; force the join path by dropping the threshold
    to 0 and diff against the fold path on the same inputs."""
    import random

    from ticdc_spark.plans import scheduler
    from ticdc_spark.plans.scheduler import (
        assign_absent,
        balance_spans,
        drain_node,
    )

    rng = random.Random(23)
    node_ids = [f"n{i:02d}" for i in range(7)]
    spans = [(s, rng.choice(node_ids[:5])) for s in range(60)]
    assign = spark.createDataFrame(spans, "span_id long, node_id string")
    nodes = spark.createDataFrame([(n,) for n in node_ids],
                                  "node_id string")
    absent = spark.createDataFrame([(1000 + i,) for i in range(9)],
                                   "span_id long")

    def snap(df, key="span_id"):
        return sorted(tuple(r) for r in df.collect())

    fold = (
        snap(balance_spans(assign, nodes)),
        snap(balance_spans(assign, nodes, batch_size=4)),
        snap(drain_node(assign, nodes, "n00")),
        snap(assign_absent(absent, assign, nodes)),
        snap(assign_absent(absent, assign, nodes, available_size=3)),
    )
    monkeypatch.setattr(scheduler, "LIT_FOLD_MAX_NODES", 0)
    join = (
        snap(balance_spans(assign, nodes)),
        snap(balance_spans(assign, nodes, batch_size=4)),
        snap(drain_node(assign, nodes, "n00")),
        snap(assign_absent(absent, assign, nodes)),
        snap(assign_absent(absent, assign, nodes, available_size=3)),
    )
    for i, (a, b) in enumerate(zip(fold, join)):
        assert a == b, f"planner {i}: join path diverged"


def test_choose_merged_spans_break_rules(spark):
    """chooseMergedSpans (`split_span_checker.go:768-871`): node change,
    region cap (3/4*threshold), traffic cap, and the per-table batch cap
    each break/limit runs; runs of 1 are not merge groups."""
    from ticdc_spark.plans.span_split import choose_merged_spans

    rows = [
        # spans 0,1 same node small -> merge; span 2 other node
        (1, 0, 10, "n0", 2, 100), (1, 10, 20, "n0", 2, 100),
        (1, 20, 30, "n1", 2, 100),
        # spans 3,4 would exceed region cap 12 with span 5 (6+6+6=18>12)
        (1, 30, 40, "n1", 6, 100), (1, 40, 50, "n1", 6, 100),
        (1, 50, 60, "n1", 6, 100),
        # traffic cap 750: 400+400 > 750 -> singleton runs
        (2, 0, 10, "n0", 1, 400), (2, 10, 20, "n0", 1, 400),
    ]
    spans = spark.createDataFrame(
        rows, "table_id long, start_key long, end_key long, "
              "node_id string, region_count long, traffic long")
    out = {(r["table_id"], r["merge_group"]): r
           for r in choose_merged_spans(
               spans, region_threshold=16, write_threshold=1000).collect()}
    # table 1 walk (sorted): (0,1 n0) (2 n1 r2) (3 n1 r6) (4,5 n1 r6):
    #   run1=[0,1] (node break at 2); run2=[2,3] r=8, +6>12 break;
    #   run3=[4,5] r=12 — the cap is STRICTLY greater-than, 12 merges
    assert out[(1, 0)]["n_spans"] == 2 and out[(1, 0)]["start_key"] == 0
    assert out[(1, 1)]["n_spans"] == 2 and out[(1, 1)]["start_key"] == 20
    assert out[(1, 1)]["region_count"] == 8
    assert out[(1, 2)]["region_count"] == 12  # exactly at cap: allowed
    assert (1, 3) not in out
    assert not [k for k in out if k[0] == 2]  # traffic cap -> no groups
    # batch cap: 8 mergeable pairs on one node, cap 3
    many = spark.createDataFrame(
        [(3, i * 10, i * 10 + 10, "n0", 5, 300) for i in range(16)],
        "table_id long, start_key long, end_key long, node_id string, "
        "region_count long, traffic long")
    capped = choose_merged_spans(
        many, region_threshold=16, write_threshold=1000,
        batch_cap=3).collect()
    # region cap 12: runs of two 5s (5+5=10, +5>12) -> 8 pairs, capped at 3
    assert len(capped) == 3
    assert sorted(r["merge_group"] for r in capped) == [0, 1, 2]


def test_choose_merged_spans_cap_floors_at_quarter_first(spark):
    """Go evaluates threshold/4*3 with integer floor at /4: threshold
    10 -> cap 6 (not 10*3//4 = 7).  Spans 3+3=6 merge (at cap), the
    next span of 1 (total 7 > 6) breaks — under the wrong rounding it
    would merge."""
    from ticdc_spark.plans.span_split import choose_merged_spans

    spans = spark.createDataFrame(
        [(1, 0, 10, "n0", 3, 10), (1, 10, 20, "n0", 3, 10),
         (1, 20, 30, "n0", 1, 10)],
        "table_id long, start_key long, end_key long, node_id string, "
        "region_count long, traffic long")
    out = choose_merged_spans(spans, region_threshold=10).collect()
    assert len(out) == 1
    assert out[0]["n_spans"] == 2 and out[0]["region_count"] == 6
