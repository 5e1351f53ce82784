"""Scheduler balance planning — `pkg/scheduler/balance.go:29-146`.

The reference rebalances dispatcher spans across nodes: every node must
reach at least ``floor(total / n_nodes)`` tasks; movers are popped one
at a time from the currently most-loaded node (max-heap) and pushed to
the currently least-loaded (min-heap) until every under-loaded node
reaches the floor (``CheckBalanceStatus`` computes the move size,
``Balance`` executes up to ``batchSize`` moves). The reference
randomizes victim order within a node; here victims are taken in
span-id order so the plan is deterministic and oracle-checkable.

Closed form instead of heap simulation: the e-th pop from a node of
load L has priority ``L - e`` (the node's load at that pop), so the
heap pop sequence is exactly the top-D of ``{load_i - e}`` ordered by
(priority desc, node asc, e asc); symmetrically the k-th push lands on
the slot with the k-th smallest ``load_j + f`` (f-th fill of node j).

Scale shape (the reference targets >1M tables, `README.md:7`): NO
global windows anywhere — a ``Window.orderBy`` with no partitionBy is
a single-partition sort of every span row on one core at every
rebalance tick.  Instead:

* the only per-span window is partitioned by ``node_id`` (pop index
  ``e`` within a node);
* the **loads table** (one row per NODE) is collected once — it is
  control-plane metadata, exactly what the reference's maintainer holds
  in its in-memory heap — and the selection threshold ``p* = max{p ≥ 0
  : N(p) ≥ D}`` with ``N(p) = Σ_i max(0, load_i - p)`` plus the
  per-node surrender counts are O(n_nodes) driver arithmetic
  (``_take_plan``);
* per-selected-row global ranks (the heap pop/push order) are literal
  folds over those collected loads — rank of pop ``(i, e)`` with
  priority ``p = load_i - e`` is ``Σ_j max(0, load_j - p - 1) +
  #{j : load_j > p, node_j ≤ node_i}`` (``_fold_take_rank``) — pure
  projections, no metadata joins.  The span side keeps exactly one
  exchange (the per-node victim window); nothing is ever sorted or
  aggregated on a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _node_loads(assign: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node_id, load) for every active node; absent nodes load 0."""
    return (
        nodes.join(
            assign.groupBy("node_id").agg(F.count(F.lit(1)).alias("load")),
            "node_id", "left",
        ).select(
            "node_id", F.coalesce("load", F.lit(0)).cast("long").alias("load")
        )
    )


def _collect_loads(loads: DataFrame) -> list[tuple[str, int]]:
    """Collect the n_nodes-row loads table.  This is control-plane
    metadata (the reference keeps it in the maintainer's in-memory heap,
    `balance.go:58-146`); the collect is O(n_nodes), never O(spans)."""
    return sorted((r["node_id"], int(r["load"])) for r in loads.collect())


def _literal_loads(spark, rows: list[tuple[str, int]]) -> DataFrame:
    return spark.createDataFrame(rows, "node_id string, load long")


def _take_plan(rows: list[tuple[str, int]],
               batch_size: int | None) -> tuple[int, int, dict[str, int]]:
    """Driver-side closed form over the n_nodes loads (replaces the old
    chain of metadata aggregations, which cost a Spark stage per step):

    - ``floor_limit = total div n``; deficit ``d = Σ max(0, floor−l)``
      (`CheckBalanceStatus`, `balance.go:29-55`), capped at batch_size;
    - the D-th heap pop's priority ``p* = max{p ≥ 0 : N(p) ≥ d}`` with
      ``N(p) = Σ max(0, l − p)`` (N is nonincreasing — exact binary
      search);
    - per-node surrender counts ``k_i``: everything above p*, plus the
      p* pop for the first ``r = d − Σ max(0, l − p* − 1)`` qualifying
      nodes in node-id order (the heap's deterministic tiebreak).

    Returns (floor_limit, d, {node_id: k}).
    """
    n = len(rows)
    total = sum(l for _, l in rows)
    floor_limit = total // n if n else 0
    d = sum(max(0, floor_limit - l) for _, l in rows)
    if batch_size is not None:
        d = min(d, batch_size)
    if d <= 0:
        return floor_limit, 0, {nid: 0 for nid, _ in rows}

    def n_of(p: int) -> int:
        return sum(max(0, l - p) for _, l in rows)

    lo, hi, p_star = 0, max(l for _, l in rows), 0
    while lo <= hi:
        mid = (lo + hi) // 2
        if n_of(mid) >= d:
            p_star, lo = mid, mid + 1
        else:
            hi = mid - 1
    r = d - sum(max(0, l - p_star - 1) for _, l in rows)
    ks: dict[str, int] = {}
    for nid, l in rows:  # rows sorted by node_id — tie order
        k = max(0, l - p_star - 1)
        if l > p_star and r > 0:
            k, r = k + 1, r - 1
        ks[nid] = k
    return floor_limit, d, ks


# Above this node count the literal CASE chains / fold expressions grow
# linearly in the plan tree (compile cost, codegen size); the planners
# switch to broadcast joins against the literal loads table — identical
# semantics, one extra cheap broadcast stage per lookup.
LIT_FOLD_MAX_NODES = 256


def _lit_map(rows: list[tuple[str, int]], node_col) -> F.Column:
    """node_id -> value as a literal CASE chain (n_nodes arms).  Turns a
    metadata join into a projection — zero exchanges.  Used below
    ``LIT_FOLD_MAX_NODES``; `_with_node_value` flips to a broadcast join
    beyond it."""
    expr: F.Column = F.lit(None).cast("long")
    for nid, v in rows:
        expr = F.when(node_col == nid, F.lit(int(v))).otherwise(expr)
    return expr


def _fold_take_rank(rows: list[tuple[str, int]], p_col, node_col) -> F.Column:
    """Global heap-pop rank of pop (node, priority p): pops strictly
    ahead are the higher-priority ones (Σ_j max(0, l_j − p − 1)) plus
    same-priority pops from lower-or-equal node ids.  Literal fold over
    the collected loads — a projection, not a join."""
    total: F.Column = F.lit(0)
    for nj, lj in rows:
        total = (
            total
            + F.greatest(F.lit(lj) - p_col - 1, F.lit(0))
            + F.when((F.lit(lj) > p_col) & (F.lit(nj) <= node_col),
                     F.lit(1)).otherwise(F.lit(0))
        )
    return total.cast("long")


def _fold_slot_rank(rows: list[tuple[str, int]], q_col, node_col,
                    per_node_cap=None) -> F.Column:
    """Heap-push rank of slot (node, priority q), ascending: slots
    strictly ahead from node j are its priorities below q (bounded at
    ``per_node_cap(j)`` fills when given — the drain form), plus the
    same-priority slot of lower-or-equal node ids."""
    total: F.Column = F.lit(0)
    for nj, lj in rows:
        below = F.greatest(q_col - 1 - F.lit(lj), F.lit(0))
        if per_node_cap is not None:
            below = F.least(below, F.lit(int(per_node_cap(nj, lj))))
        tie = (F.lit(lj) < q_col) & (F.lit(nj) <= node_col)
        if per_node_cap is not None:
            tie = tie & (q_col <= F.lit(lj) + F.lit(int(per_node_cap(nj, lj))))
        total = total + below + F.when(tie, F.lit(1)).otherwise(F.lit(0))
    return total.cast("long")


def _with_node_value(df: DataFrame, rows: list[tuple[str, int]],
                     out_col: str) -> DataFrame:
    """Attach the per-node metadata value keyed by ``node_id``: literal
    CASE projection for small clusters, broadcast join beyond
    ``LIT_FOLD_MAX_NODES`` (thousands of nodes)."""
    if len(rows) <= LIT_FOLD_MAX_NODES:
        return df.withColumn(out_col, _lit_map(rows, F.col("node_id")))
    lookup = _literal_loads(df.sparkSession, rows).select(
        "node_id", F.col("load").alias(out_col))
    return df.join(F.broadcast(lookup), "node_id", "left")


def _loads_j(spark, rows: list[tuple[str, int]]) -> DataFrame:
    return _literal_loads(spark, rows).select(
        F.col("node_id").alias("_nj"), F.col("load").alias("_lj"))


def _with_take_rank(df: DataFrame, rows: list[tuple[str, int]],
                    out_col: str) -> DataFrame:
    """Heap-pop rank over (``_p``, ``node_id``) — fold projection for
    small clusters; beyond the threshold, a broadcast cross join against
    the n_nodes loads and a re-aggregation.  The input here is at most
    D = batch-size rows (the tick's move budget), so the D x n_nodes
    expansion is bounded by the move budget, never by span count."""
    if len(rows) <= LIT_FOLD_MAX_NODES:
        return df.withColumn(
            out_col, _fold_take_rank(rows, F.col("_p"), F.col("node_id")))
    keys = df.columns
    contrib = (
        F.greatest(F.col("_lj") - F.col("_p") - 1, F.lit(0))
        + F.when((F.col("_lj") > F.col("_p"))
                 & (F.col("_nj") <= F.col("node_id")),
                 F.lit(1)).otherwise(F.lit(0))
    )
    return (
        df.crossJoin(F.broadcast(_loads_j(df.sparkSession, rows)))
        .groupBy(*keys)
        .agg(F.sum(contrib).cast("long").alias(out_col))
    )


def _with_slot_rank(df: DataFrame, rows: list[tuple[str, int]],
                    out_col: str,
                    per_node_cap: int | None = None) -> DataFrame:
    """Heap-push rank over (``_q``, ``node_id``); ``per_node_cap`` is
    the constant fill bound used by drain/assign (all call sites pass
    None or a constant).  Join path mirrors `_with_take_rank` — the slot
    side is O(imbalance + d) rows."""
    if len(rows) <= LIT_FOLD_MAX_NODES:
        cap_fn = (None if per_node_cap is None
                  else (lambda nj, lj: per_node_cap))
        return df.withColumn(
            out_col,
            _fold_slot_rank(rows, F.col("_q"), F.col("node_id"), cap_fn))
    keys = df.columns
    below = F.greatest(F.col("_q") - 1 - F.col("_lj"), F.lit(0))
    tie = (F.col("_lj") < F.col("_q")) & (F.col("_nj") <= F.col("node_id"))
    if per_node_cap is not None:
        below = F.least(below, F.lit(int(per_node_cap)))
        tie = tie & (F.col("_q") <= F.col("_lj") + F.lit(int(per_node_cap)))
    contrib = below + F.when(tie, F.lit(1)).otherwise(F.lit(0))
    return (
        df.crossJoin(F.broadcast(_loads_j(df.sparkSession, rows)))
        .groupBy(*keys)
        .agg(F.sum(contrib).cast("long").alias(out_col))
    )


def balance_spans(
    assign: DataFrame,
    nodes: DataFrame,
    batch_size: int | None = None,
) -> DataFrame:
    """Rebalance plan: input ``(span_id, node_id)`` current assignment +
    ``(node_id)`` active nodes; output one row per span with
    ``node_id_before``, ``node_id_after``, and ``move_rank`` (null for
    spans that stay). Nodes absent from ``assign`` receive work; moves
    stop once every node holds >= floor(total/n) spans (or at
    ``batch_size``)."""
    # loads is one row per NODE and feeds ~6 subtrees (threshold, take
    # counts, both rank joins, deficit).  Left lazy, every branch drags
    # the full span-aggregation lineage into the plan (~400 exchanges)
    # and each metadata step costs a Spark stage; collected, it is the
    # same plan-time metadata as an IVF codebook and the whole
    # threshold/count derivation is O(n_nodes) driver arithmetic
    # (_take_plan).  The per-SPAN work (victim window, rank join)
    # stays fully distributed.
    spark = assign.sparkSession
    rows = _collect_loads(_node_loads(assign, nodes))
    floor_limit, d, ks_map = _take_plan(rows, batch_size)
    ks_rows = sorted(ks_map.items())

    # victims: e-th pop from a node has priority load - e.  The window
    # is PARTITIONED by node — the only exchange on the span side; the
    # load/k lookups and both heap ranks are literal folds over the
    # collected loads (projections, zero extra stages).
    w_node = Window.partitionBy("node_id").orderBy("span_id")
    victims = (
        _with_node_value(assign, ks_rows, "_k")
        .filter(F.col("_k") > 0)
        .withColumn("_e", F.row_number().over(w_node))
        .filter(F.col("_e") <= F.col("_k"))  # exactly D rows survive
    )
    victims = _with_node_value(victims, rows, "_load").withColumn(
        "_p", F.col("_load") - F.col("_e"))
    take_rank = _with_take_rank(victims, rows, "_take_rank").select(
        "span_id", "_take_rank")

    # slots: f-th fill of an under-floor node has priority load + f;
    # every slot is consumed (sum of per-node deficits == D), so only
    # the rank is needed — same closed form, ascending.  Generated by a
    # distributed explode from the literal loads (never a driver list:
    # the fill count scales with the imbalance, not n_nodes).
    slots = (
        _literal_loads(spark, rows)
        .filter(F.col("load") < F.lit(floor_limit))
        .select(
            "node_id", "load",
            F.explode(
                F.sequence(F.lit(1), F.lit(floor_limit) - F.col("load"))
            ).alias("_f"),
        )
        .withColumn("_q", F.col("load") + F.col("_f"))
    )
    slot_rank = _with_slot_rank(slots, rows, "_slot_rank").select(
        F.col("node_id").alias("_to_node"), "_slot_rank")
    moved = (
        take_rank
        .filter(F.col("_take_rank") <= F.lit(d))
        .join(
            F.broadcast(slot_rank),
            F.col("_take_rank") == F.col("_slot_rank"),
        )
        .select(
            "span_id",
            F.col("_to_node"),
            F.col("_take_rank").alias("move_rank"),
        )
    )
    # moved holds exactly d rows — a tick's move budget (the reference
    # caps it at batchSize per Balance call), so broadcasting it keeps
    # the final annotate join shuffle-free on the span side
    return (
        assign.join(F.broadcast(moved), "span_id", "left")
        .select(
            "span_id",
            F.col("node_id").alias("node_id_before"),
            F.coalesce("_to_node", F.col("node_id")).alias("node_id_after"),
            "move_rank",
        )
    )


def check_balance_status(assign: DataFrame, nodes: DataFrame) -> DataFrame:
    """`CheckBalanceStatus` (`balance.go:29-55`): the number of spans
    that must move — sum over nodes of max(0, floor - load). 1-row
    metadata aggregate."""
    loads = (
        nodes.join(
            assign.groupBy("node_id").agg(F.count(F.lit(1)).alias("load")),
            "node_id", "left",
        ).select(F.coalesce("load", F.lit(0)).alias("load"))
    )
    return (
        loads.crossJoin(
            F.broadcast(loads.agg(
                F.expr("sum(load) div count(*)").alias("floor_limit")))
        )
        .agg(
            F.sum(
                F.greatest(F.col("floor_limit") - F.col("load"), F.lit(0))
            ).cast("long").alias("move_size")
        )
    )


def drain_node(
    assign: DataFrame,
    nodes: DataFrame,
    drained: str,
) -> DataFrame:
    """Drain planning (`maintainer/scheduler/drain.go`): every span on
    the drained node moves off; targets fill by the same least-loaded
    slot priority as ``balance_spans`` (load_j + f, smallest first), so
    the drained work spreads evenly across the survivors. Victims leave
    in span-id order. Output mirrors ``balance_spans``.

    Same no-global-window shape: victim rank is a window partitioned by
    the (single) drained node; slot ranks are the literal-fold closed
    form over the collected survivor loads, with the per-survivor fill
    sequence pre-capped at ``max_load - load_j + ceil(d/n)`` (provably
    covers the top-d slots, so the transient explode is
    O(imbalance + d), not O(n*d))."""
    survivors = nodes.filter(F.col("node_id") != drained)
    spark = assign.sparkSession
    # literal node-loads metadata + scalar victim count — same
    # collected-codebook rationale as balance_spans
    rows = _collect_loads(
        _node_loads(assign.filter(F.col("node_id") != drained), survivors))
    loads = _literal_loads(spark, rows)
    victims = assign.filter(F.col("node_id") == drained)
    d = int(victims.count())
    max_load = max((l for _, l in rows), default=0)
    n = len(rows)
    # slots: survivor j's f-th fill, f capped so the top-d by priority
    # are guaranteed present (priority q <= max_load + ceil(d/n) always
    # admits >= d slots across survivors)
    cap = F.greatest(
        F.lit(max_load) - F.col("load") + F.lit(-(-d // n) if n else 0),
        F.lit(1),
    )
    slots = (
        loads.filter(F.lit(d > 0))
        .select(
            "node_id", "load", F.lit(d).cast("long").alias("d"),
            F.explode(
                F.sequence(F.lit(1), F.least(cap, F.lit(d)))
            ).alias("_f"),
        )
        .withColumn("_q", F.col("load") + F.col("_f"))
    )
    # slots from node k strictly ahead: priorities in (load_k,
    # load_k + d] below q — the bounded-fill rank
    slot_rank = (
        _with_slot_rank(slots, rows, "_slot_rank", per_node_cap=d)
        .filter(F.col("_slot_rank") <= F.col("d"))
        .select(F.col("node_id").alias("_to_node"), "_slot_rank")
    )
    # victims all live on ONE node: partitioned window, no global sort
    w_take = Window.partitionBy("node_id").orderBy("span_id")
    moved = (
        victims.withColumn("_take_rank",
                           F.row_number().over(w_take).cast("long"))
        .join(F.broadcast(slot_rank),
              F.col("_take_rank") == F.col("_slot_rank"))
        .select("span_id", "_to_node",
                F.col("_take_rank").alias("move_rank"))
    )
    return (
        assign.join(moved, "span_id", "left")
        .select(
            "span_id",
            F.col("node_id").alias("node_id_before"),
            F.coalesce("_to_node", F.col("node_id")).alias("node_id_after"),
            "move_rank",
        )
    )


def assign_absent(
    absent: DataFrame,
    assign: DataFrame,
    nodes: DataFrame,
    available_size: int | None = None,
    bucket_size: int = 4096,
) -> DataFrame:
    """`BasicSchedule` (`pkg/scheduler/basic.go:23-56`): walk the absent
    tasks in order and hand each to the currently least-loaded node
    (min-heap; ties determinized by node id, matching drain/balance),
    stopping at ``available_size``.

    The i-th scheduled task lands on the slot with the i-th smallest
    ``(load_j + f)`` — drain's slot closed form.  The absent tasks'
    global order (the reference iterates a list) is computed WITHOUT a
    single-partition sort: bucket by span-id range, take a per-bucket
    row_number, and add the collected per-bucket offsets (bucket counts
    are metadata — thousands of rows at a million spans).

    Output: (span_id, node_id, assign_rank) for the scheduled prefix;
    unscheduled absent tasks carry node_id null.
    """
    spark = absent.sparkSession
    rows = _collect_loads(_node_loads(assign, nodes))
    n = len(rows)
    d = int(absent.count())
    if available_size is not None:
        d = min(d, int(available_size))
    max_load = max((l for _, l in rows), default=0)

    # global rank = bucket offset + intra-bucket rank (no global sort)
    bucketed = absent.withColumn(
        "_b", F.expr(f"span_id div {int(bucket_size)}"))
    counts = sorted(
        (r["_b"], r["c"]) for r in
        bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = {}, 0
    for b, c in counts:
        offsets[b] = acc
        acc += c
    off_df = F.broadcast(spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "_b long, _off long"))
    w_b = Window.partitionBy("_b").orderBy("span_id")
    ranked = (
        bucketed.join(off_df, "_b")
        .withColumn(
            "assign_rank",
            (F.col("_off") + F.row_number().over(w_b)).cast("long"))
    )

    if d <= 0 or n == 0:
        return ranked.select(
            "span_id", F.lit(None).cast("string").alias("node_id"),
            F.lit(None).cast("long").alias("assign_rank"))

    cap = F.greatest(
        F.lit(max_load) - F.col("load") + F.lit(-(-d // n)), F.lit(1))
    slots = (
        _literal_loads(spark, rows)
        .select(
            "node_id", "load",
            F.explode(
                F.sequence(F.lit(1), F.least(cap, F.lit(d)))
            ).alias("_f"),
        )
        .withColumn("_q", F.col("load") + F.col("_f"))
    )
    slot_rank = (
        _with_slot_rank(slots, rows, "_slot_rank", per_node_cap=d)
        .filter(F.col("_slot_rank") <= F.lit(d))
        .select(F.col("node_id").alias("_to"), "_slot_rank")
    )
    return (
        ranked.join(
            F.broadcast(slot_rank),
            ranked["assign_rank"] == slot_rank["_slot_rank"], "left")
        .select(
            "span_id",
            F.col("_to").alias("node_id"),
            F.when(F.col("_to").isNotNull(), F.col("assign_rank"))
            .alias("assign_rank"),
        )
    )
