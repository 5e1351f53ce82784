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
* the selection threshold ``p*`` (the priority of the D-th pop) is
  derived from the **loads table** (one row per NODE) with
  joins/aggregates — pops with priority ≥ p satisfy
  ``N(p) = Σ_i max(0, load_i - p)``, and ``p* = max{p ≥ 0 : N(p) ≥ D}``
  falls on one of O(n_nodes) candidate breakpoints, all checkable in a
  node×node broadcast join (metadata-sized);
* per-selected-row global ranks (the heap pop/push order) come from
  the same algebra — rank of pop ``(i, e)`` with priority
  ``p = load_i - e`` is ``Σ_j max(0, load_j - p - 1) +
  #{j : load_j > p, node_j ≤ node_i}`` — a broadcast join against the
  n_nodes-row loads table, aggregated per span.  No sort, no single
  partition; every shuffle is keyed on span_id.
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


def _loads_b(loads: DataFrame) -> DataFrame:
    """Broadcast-side copy of loads with sort-safe aliases."""
    return F.broadcast(
        loads.select(
            F.col("node_id").alias("_nj"), F.col("load").alias("_lj")
        )
    )


def _take_threshold(loads: DataFrame, deficit: DataFrame) -> DataFrame:
    """1-row (p_star, r, d): the D-th heap pop has priority p_star, and
    r of the ties at exactly p_star are taken (node-id order).

    All joins/aggregates over n_nodes-row frames — no windows."""
    lb = _loads_b(loads)
    # segment stats per node i: m_i = #loads ranked >= i (load desc,
    # node asc tiebreak), cum_i = their load sum.  For the max-node of
    # each distinct load value these are exactly the piecewise-linear
    # segment constants of N(p) = cum - m*p.
    seg = (
        loads.crossJoin(lb)
        .filter(
            (F.col("_lj") > F.col("load"))
            | ((F.col("_lj") == F.col("load"))
               & (F.col("_nj") <= F.col("node_id")))
        )
        .groupBy("node_id", "load")
        .agg(F.sum("_lj").alias("cum"), F.count(F.lit(1)).alias("m"))
    )
    # candidate thresholds: interior solve point of each segment
    # (max p with cum - m*p >= D) and each boundary load-1; p >= 0.
    cand = (
        seg.crossJoin(F.broadcast(deficit))
        .select(
            F.explode(
                F.array(
                    F.greatest(
                        F.least(
                            F.col("load") - 1,
                            F.floor((F.col("cum") - F.col("d"))
                                    / F.col("m")).cast("long"),
                        ),
                        F.lit(0),
                    ),
                    F.greatest(F.col("load") - 1, F.lit(0)),
                    F.lit(0),
                )
            ).alias("p")
        )
        .distinct()
    )
    n_of_p = (
        cand.crossJoin(lb)
        .groupBy("p")
        .agg(
            F.sum(F.greatest(F.col("_lj") - F.col("p"), F.lit(0)))
            .alias("n_p")
        )
    )
    p_star = (
        n_of_p.crossJoin(F.broadcast(deficit))
        .filter(F.col("n_p") >= F.col("d"))
        .agg(F.coalesce(F.max("p"), F.lit(0)).alias("p_star"))
    )
    n_hi = (
        p_star.crossJoin(lb)
        .groupBy("p_star")
        .agg(
            F.sum(
                F.greatest(F.col("_lj") - F.col("p_star") - 1, F.lit(0))
            ).alias("n_hi")
        )
    )
    return (
        n_hi.crossJoin(F.broadcast(deficit))
        .select(
            "p_star",
            (F.col("d") - F.col("n_hi")).alias("r"),
            "d",
        )
    )


def _per_node_take_counts(loads: DataFrame, thresh: DataFrame) -> DataFrame:
    """(node_id, k): how many spans each node surrenders — everything
    above p_star, plus its p_star pop for the first r nodes (node-id
    asc) that have one."""
    lt = loads.crossJoin(F.broadcast(thresh))
    qual = lt.filter(F.col("load") > F.col("p_star"))
    tie_rank = (
        qual.crossJoin(
            F.broadcast(
                qual.select(F.col("node_id").alias("_nj"),
                            F.col("load").alias("_lj"))
            )
        )
        .filter(F.col("_nj") <= F.col("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("_tie_rank"))
    )
    return (
        lt.join(F.broadcast(tie_rank), "node_id", "left")
        .select(
            "node_id",
            (
                F.greatest(F.col("load") - F.col("p_star") - 1, F.lit(0))
                + F.when(
                    F.col("_tie_rank").isNotNull()
                    & (F.col("_tie_rank") <= F.col("r")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("k"),
        )
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
    loads = _node_loads(assign, nodes)
    totals = loads.agg(
        F.sum("load").alias("total"), F.count(F.lit(1)).alias("n_nodes")
    ).select(
        F.expr("total div n_nodes").alias("floor_limit"),
    )
    l2 = loads.crossJoin(F.broadcast(totals))
    deficit = l2.select(
        F.sum(
            F.greatest(F.col("floor_limit") - F.col("load"), F.lit(0))
        ).cast("long").alias("d")
    )
    d_capped = deficit.select(
        (F.least(F.col("d"), F.lit(batch_size)) if batch_size is not None
         else F.col("d")).alias("d")
    )
    thresh = _take_threshold(loads, d_capped)
    ks = _per_node_take_counts(loads, thresh)

    # victims: e-th pop from a node has priority load - e.  The window
    # is PARTITIONED by node — the only per-span window in the plan.
    w_node = Window.partitionBy("node_id").orderBy("span_id")
    lb = _loads_b(loads)
    takes_sel = (
        assign.join(F.broadcast(loads), "node_id")
        .withColumn("_e", F.row_number().over(w_node))
        .join(F.broadcast(ks), "node_id")
        .filter(F.col("_e") <= F.col("k"))  # exactly D rows survive
        .withColumn("_p", F.col("load") - F.col("_e"))
    )
    # global heap-pop rank, closed form (no sort): pops strictly ahead
    # are the higher-priority ones plus same-priority ones from
    # lower-numbered nodes (each node has exactly one pop per priority).
    take_rank = (
        takes_sel.crossJoin(lb)
        .groupBy("span_id", "node_id", "_p")
        .agg(
            F.sum(
                F.greatest(F.col("_lj") - F.col("_p") - 1, F.lit(0))
                + F.when(
                    (F.col("_lj") > F.col("_p"))
                    & (F.col("_nj") <= F.col("node_id")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("_take_rank")
        )
        .select("span_id", "_take_rank")
    )

    # slots: f-th fill of an under-floor node has priority load + f;
    # every slot is consumed (sum of per-node deficits == D), so only
    # the rank is needed — same closed form, ascending.
    slots = (
        l2.filter(F.col("load") < F.col("floor_limit"))
        .select(
            "node_id", "load",
            F.explode(
                F.sequence(F.lit(1), F.col("floor_limit") - F.col("load"))
            ).alias("_f"),
        )
        .withColumn("_q", F.col("load") + F.col("_f"))
    )
    slot_rank = (
        slots.crossJoin(lb)
        .groupBy("node_id", "_q")
        .agg(
            F.sum(
                F.greatest(F.col("_q") - 1 - F.col("_lj"), F.lit(0))
                + F.when(
                    (F.col("_lj") < F.col("_q"))
                    & (F.col("_nj") <= F.col("node_id")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("_slot_rank")
        )
        .select(F.col("node_id").alias("_to_node"), "_slot_rank")
    )
    moved = (
        take_rank.crossJoin(F.broadcast(d_capped))
        .filter(F.col("_take_rank") <= F.col("d"))
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
    return (
        assign.join(moved, "span_id", "left")
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
    the (single) drained node; slot ranks are the broadcast-join closed
    form, with the per-survivor fill sequence pre-capped at
    ``max_load - load_j + ceil(d/n)`` (provably covers the top-d slots,
    so the transient explode is O(imbalance + d), not O(n*d))."""
    survivors = nodes.filter(F.col("node_id") != drained)
    loads = _node_loads(assign.filter(F.col("node_id") != drained),
                        survivors)
    victims = assign.filter(F.col("node_id") == drained)
    d = victims.agg(F.count(F.lit(1)).cast("long").alias("d"))
    stats = loads.agg(
        F.max("load").alias("max_load"),
        F.count(F.lit(1)).alias("n"),
    )
    # slots: survivor j's f-th fill, f capped so the top-d by priority
    # are guaranteed present (priority q <= max_load + ceil(d/n) always
    # admits >= d slots across survivors)
    slots = (
        loads.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_cap",
            F.greatest(
                F.col("max_load") - F.col("load")
                + F.ceil(F.col("d") / F.col("n")).cast("long"),
                F.lit(1),
            ),
        )
        .filter(F.col("d") > 0)
        .select(
            "node_id", "load", "d",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("_cap"), F.col("d")))
            ).alias("_f"),
        )
        .withColumn("_q", F.col("load") + F.col("_f"))
    )
    lb = _loads_b(loads)
    slot_rank = (
        slots.crossJoin(lb)
        .groupBy("node_id", "_q", "d")
        .agg(
            F.sum(
                # slots from node k strictly ahead: priorities in
                # (load_k, load_k + d] below q
                F.greatest(
                    F.least(F.col("_q") - 1 - F.col("_lj"), F.col("d")),
                    F.lit(0),
                )
                + F.when(
                    (F.col("_lj") < F.col("_q"))
                    & (F.col("_q") <= F.col("_lj") + F.col("d"))
                    & (F.col("_nj") <= F.col("node_id")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("_slot_rank")
        )
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
