"""R7 — table-span splitting: hot-table scale-out planning (SURVEY §2.10).

Reference: `maintainer/split/splitter.go:28-87` dispatches on split type —
``region_count`` (`region_count_splitter.go:38-199` + evenlySplitStepper
`:152-209`) and ``write_bytes`` (`write_bytes_splitter.go:89-226`
splitRegionsByWrittenBytesV1). A hot table's span is cut into sub-spans
each handled by its own dispatcher; this is the reference's answer to the
skew problem Spark answers with AQE/salting, and here it doubles as the
planner for salted repartition widths.

Both splitters are *planning* operators over region metadata (one row per
TiKV region: ordered key range + written bytes). Region lists are small
per table (thousands), so:

- ``region_count``: pure column algebra — the evenlySplitStepper's
  remainder arithmetic is closed-form per region rank, no iteration.
- ``write_bytes``: the reference algorithm is inherently sequential
  (running span weight, restSpans re-estimation). It runs per table under
  ``applyInPandas`` — distributed across tables, exact-sequential within
  one, which is the same unit of work the reference's maintainer does on
  one goroutine per table.

Synthetic regions derive from the changelog (pk-range buckets with
deterministic written-bytes), standing in for the PD ScanRegions call.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# region_count_splitter.go:32
MAX_SPAN_COUNT = 1000
# write_bytes_splitter.go:28 — every region's written keys get +1 so
# empty regions still carry weight (region-count awareness)
REGION_WRITTEN_KEY_BASE = 1


def synthetic_regions(cl: DataFrame, bucket: int = 64) -> DataFrame:
    """Stand-in for PD ScanRegions (`write_bytes_splitter.go:59-66`): per
    (schema, table), contiguous pk-range buckets with deterministic
    written-bytes. One shuffle (the groupBy); regions are metadata-sized.
    """
    pk_bucket = F.expr(f"pk div {bucket}")
    return (
        cl.groupBy("schema_name", "table_name", pk_bucket.alias("region_idx"))
        .agg(
            (F.col("region_idx") * bucket).alias("start_key"),
            ((F.col("region_idx") + 1) * bucket).alias("end_key"),
            (F.count(F.lit(1)) * 32 + F.sum(F.pmod(F.col("pk"), F.lit(97))))
            .alias("written_bytes"),
        )
    )


def split_spans_region_count(
    regions: DataFrame,
    region_count_per_span: int = 3,
    spans_num: int = 0,
    region_threshold: int = 0,
    max_span_count: int = MAX_SPAN_COUNT,
) -> DataFrame:
    """Even split by region count (`region_count_splitter.go:69-150` +
    evenlySplitStepper `:158-209`). The stepper hands out
    ``regionPerSpan + 1`` regions to the first ``remain`` spans, then
    ``regionPerSpan`` — closed form: region at 0-based rank *i* lands in
    span ``i div (R+1)`` while ``i < remain*(R+1)``, else
    ``remain + (i - remain*(R+1)) div R``.

    spans_num > 0 splits to exactly that many spans (skipped when fewer
    regions than spans, `:91-99`); spans_num == 0 targets
    region_count_per_span capped at max_span_count, and skips entirely
    when the table has <= region_threshold regions (`:82-89`)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("schema_name", "table_name")
    ranked = regions.withColumn(
        "_i",
        F.row_number().over(w.orderBy("region_idx")) - 1,
    ).withColumn("_n", F.count(F.lit(1)).over(w))

    n = F.col("_n")
    if spans_num > 0:
        skip = n < F.lit(spans_num)
        span_count = F.lit(spans_num)
        rps = F.expr(f"_n div {spans_num}")
        remain = n % spans_num
    else:
        skip = (
            F.lit(region_threshold == 0) | (n <= F.lit(region_threshold))
        )
        cap_hit = F.expr(f"_n div {region_count_per_span}") > max_span_count
        even = (n % region_count_per_span) == 0
        span_count = (
            F.when(cap_hit, F.lit(max_span_count))
            .when(even, F.expr(f"_n div {region_count_per_span}"))
            .otherwise(F.expr(f"_n div {region_count_per_span}") + 1)
        )
        rps = (
            F.when(cap_hit, F.expr(f"_n div {max_span_count}"))
            .when(even, F.lit(region_count_per_span))
            .otherwise((n / span_count).cast("long"))
        )
        remain = (
            F.when(cap_hit, n % max_span_count)
            .when(even, F.lit(0))
            .otherwise(n - rps * span_count)
        )

    i = F.col("_i")
    fat = remain * (rps + 1)  # ranks served by the remain+1-sized spans
    span_id = F.when(
        skip, F.lit(0)
    ).when(i < fat, (i / (rps + 1)).cast("long")).otherwise(
        remain + ((i - fat) / rps).cast("long")
    )
    return (
        ranked.withColumn("span_id", span_id)
        .groupBy("schema_name", "table_name", "span_id")
        .agg(
            F.min("start_key").alias("start_key"),
            F.max("end_key").alias("end_key"),
            F.count(F.lit(1)).alias("region_count"),
            F.sum("written_bytes").alias("written_bytes"),
        )
    )


def _greedy_write_split(ws: list[int], spans_num: int) -> list[tuple[int, int, int, int]]:
    """Exact port of splitRegionsByWrittenBytesV1's loop
    (`write_bytes_splitter.go:105-226`) over one table's ordered region
    weights. Returns (start_i, end_i, region_count, weight) per span;
    weights already include REGION_WRITTEN_KEY_BASE."""
    n = len(ws)
    if n == 0:
        return []
    total = sum(ws)
    limit = total // spans_num
    spans: list[tuple[int, int, int, int]] = []
    span_w = 0
    span_start = 0
    rest_spans = spans_num
    rest_weight = total
    region_count = 0
    for i in range(n):
        rest_regions = n - i
        region_count += 1
        span_w += ws[i]
        if rest_spans == 1:
            if rest_weight < limit:
                spans.append(
                    (span_start, n - 1, n - span_start,
                     sum(ws[span_start:]))
                )
                break
            rest_spans = rest_weight // limit
        if rest_regions <= rest_spans:
            spans.append((span_start, i, region_count, span_w))
            rest_spans -= 1
            rest_weight -= span_w
            span_w = 0
            region_count = 0
            span_start = i + 1
            continue
        if span_w > limit:
            spans.append((span_start, i, region_count, span_w))
            rest_spans -= 1
            rest_weight -= span_w
            span_w = 0
            region_count = 0
            span_start = i + 1
    return spans


def split_spans_write_bytes(regions: DataFrame, spans_num: int) -> DataFrame:
    """Write-bytes balanced split (`write_bytes_splitter.go:89-226`).
    Sequential greedy per table under applyInPandas — regions are
    planning metadata, one Arrow batch per table; every table splits in
    parallel. Output spans carry the normalized weight (written_bytes +
    1 per region, `:115-118`)."""
    schema = (
        "schema_name string, table_name string, span_id long, "
        "start_key long, end_key long, region_count long, weight long"
    )

    def split_table(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("region_idx").reset_index(drop=True)
        ws = (pdf["written_bytes"] + REGION_WRITTEN_KEY_BASE).tolist()
        spans = _greedy_write_split(ws, spans_num)
        return pd.DataFrame(
            {
                "schema_name": pdf["schema_name"].iloc[0],
                "table_name": pdf["table_name"].iloc[0],
                "span_id": j,
                "start_key": pdf["start_key"].iloc[s],
                "end_key": pdf["end_key"].iloc[e],
                "region_count": rc,
                "weight": wt,
            }
            for j, (s, e, rc, wt) in enumerate(spans)
        )

    return regions.groupBy("schema_name", "table_name").applyInPandas(
        split_table, schema
    )


def find_span_holes(spans: DataFrame, range_start: int = None,
                    range_end: int = None) -> DataFrame:
    """Span coverage verification (`pkg/spanz/btree_map.go:128`
    ``FindHoles``): given each table's span set, report the keyspace
    gaps (holes) and overlaps against the table's covered range — the
    maintainer's check that every key belongs to exactly one dispatcher.

    Input: (table_id, start_key, end_key).  Output one row per anomaly:
    (table_id, kind 'hole'|'overlap', gap_start, gap_end) — a hole is
    the uncovered range between consecutive spans (or against the
    explicit range bounds when given), an overlap the doubly-covered
    slice.  One lag window partitioned by table; no global sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("table_id").orderBy("start_key", "end_key")
    prev_end = F.lag("end_key").over(w)
    marked = spans.withColumn("_prev_end", prev_end)
    holes = (
        marked.filter(F.col("_prev_end").isNotNull()
                      & (F.col("_prev_end") < F.col("start_key")))
        .select(
            "table_id", F.lit("hole").alias("kind"),
            F.col("_prev_end").alias("gap_start"),
            F.col("start_key").alias("gap_end"),
        )
    )
    overlaps = (
        marked.filter(F.col("_prev_end").isNotNull()
                      & (F.col("_prev_end") > F.col("start_key")))
        .select(
            "table_id", F.lit("overlap").alias("kind"),
            F.col("start_key").alias("gap_start"),
            F.least("_prev_end", F.col("end_key")).alias("gap_end"),
        )
    )
    out = holes.unionByName(overlaps)
    if range_start is not None:
        bounds = spans.groupBy("table_id").agg(
            F.min("start_key").alias("_first"),
            F.max("end_key").alias("_last"),
        )
        head = (
            bounds.filter(F.col("_first") > F.lit(range_start))
            .select("table_id", F.lit("hole").alias("kind"),
                    F.lit(range_start).cast("long").alias("gap_start"),
                    F.col("_first").alias("gap_end"))
        )
        out = out.unionByName(head)
        if range_end is not None:
            tail = (
                bounds.filter(F.col("_last") < F.lit(range_end))
                .select("table_id", F.lit("hole").alias("kind"),
                        F.col("_last").alias("gap_start"),
                        F.lit(range_end).cast("long").alias("gap_end"))
            )
            out = out.unionByName(tail)
    return out


def choose_merged_spans(
    spans: DataFrame,
    region_threshold: int = 0,
    write_threshold: int = 0,
    batch_cap: int = 10,
) -> DataFrame:
    """Span merge chooser (scale-in) —
    `maintainer/replica/split_span_checker.go:768-871`
    ``chooseMergedSpans``: walk a table's spans in start-key order,
    greedily accumulating a run; break the run when the next span sits
    on a DIFFERENT node, or adding it would push the run's region count
    above ``region_threshold*3/4``, or its traffic above
    ``write_threshold*3/4`` (a threshold of 0 disables that check).
    Runs of length >= 2 become merge groups, capped at ``batch_cap``
    per table (`maxMergeOperatorsPerGroup`), counted in walk order.

    Input: one row per span with ``table_id, start_key, end_key,
    node_id, region_count, traffic`` (traffic in bytes — integer, so
    the fold is BIGINT-exact on any engine).

    Scale shape: the walk is sequential per table by construction (the
    reference holds the same per-group lock), so it runs as one Arrow
    batch per table under ``applyInPandas``; all tables fold in
    parallel and the output is control-plane sized.
    """
    schema = (
        "table_id long, merge_group long, start_key long, end_key long, "
        "n_spans long, region_count long, traffic long, node_id string"
    )
    # Go evaluates `threshold/4*3`: integer FLOOR at /4 first for the
    # region count (16->12 but 10->6, NOT 7), and exact float for the
    # traffic (wt/4 is a power-of-2 division, so /4*3 == 3*wt/4
    # exactly) — compared here as 4*sum > 3*wt to stay integer-exact
    region_cap = region_threshold // 4 * 3

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("start_key").reset_index(drop=True)
        runs: list[list[int]] = [[0]]
        regions = int(pdf["region_count"].iloc[0])
        traffic = int(pdf["traffic"].iloc[0])
        for i in range(1, len(pdf)):
            cur_r = int(pdf["region_count"].iloc[i])
            cur_t = int(pdf["traffic"].iloc[i])
            brk = (
                pdf["node_id"].iloc[i] != pdf["node_id"].iloc[runs[-1][-1]]
                or (region_threshold > 0 and regions + cur_r > region_cap)
                or (write_threshold > 0
                    and 4 * (traffic + cur_t) > 3 * write_threshold)
            )
            if brk:
                runs.append([i])
                regions, traffic = cur_r, cur_t
            else:
                runs[-1].append(i)
                regions += cur_r
                traffic += cur_t
        out = []
        gid = 0
        for run in runs:
            if len(run) < 2:
                continue
            if gid >= batch_cap:
                break
            out.append({
                "table_id": pdf["table_id"].iloc[0],
                "merge_group": gid,
                "start_key": pdf["start_key"].iloc[run[0]],
                "end_key": pdf["end_key"].iloc[run[-1]],
                "n_spans": len(run),
                "region_count": sum(
                    int(pdf["region_count"].iloc[i]) for i in run),
                "traffic": sum(int(pdf["traffic"].iloc[i]) for i in run),
                "node_id": pdf["node_id"].iloc[run[0]],
            })
            gid += 1
        return pd.DataFrame(
            out, columns=["table_id", "merge_group", "start_key", "end_key",
                          "n_spans", "region_count", "traffic", "node_id"])

    return spans.groupBy("table_id").applyInPandas(walk, schema)
