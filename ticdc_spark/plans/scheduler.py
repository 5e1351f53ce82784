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
load L has priority ``L - e`` (the node's load at that pop), so the heap
pop sequence is exactly the global top-D of ``{load_i - e}`` ordered by
(priority desc, node asc, e asc). Symmetrically the k-th push lands on
the slot with the k-th smallest ``load_j + f`` (f-th fill of node j).
Both are window functions over node-count metadata — no driver loop, no
heap; the frame is planning metadata (one row per span), so every
changefeed's plan computes in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    loads = (
        nodes.join(
            assign.groupBy("node_id").agg(F.count(F.lit(1)).alias("load")),
            "node_id", "left",
        ).select("node_id", F.coalesce("load", F.lit(0)).alias("load"))
    )
    totals = loads.agg(
        F.sum("load").alias("total"), F.count(F.lit(1)).alias("n_nodes")
    ).select(
        F.expr("total div n_nodes").alias("floor_limit"),
    )
    l2 = loads.crossJoin(F.broadcast(totals))
    deficit = l2.select(
        F.sum(
            F.greatest(F.col("floor_limit") - F.col("load"), F.lit(0))
        ).alias("d")
    )
    d_capped = deficit.select(
        (F.least(F.col("d"), F.lit(batch_size)) if batch_size is not None
         else F.col("d")).alias("d")
    )

    # victims: e-th pop from a node has priority load - e
    w_node = Window.partitionBy("node_id").orderBy("span_id")
    takes = (
        assign.join(F.broadcast(loads), "node_id")
        .withColumn("_e", F.row_number().over(w_node))
        .withColumn("_prio", F.col("load") - F.col("_e"))
    )
    w_take = Window.orderBy(F.desc("_prio"), F.asc("node_id"), F.asc("_e"))
    takes = takes.withColumn("_take_rank", F.row_number().over(w_take))

    # slots: f-th fill of an under-floor node has priority load + f
    slots = (
        l2.filter(F.col("load") < F.col("floor_limit"))
        .select(
            "node_id", "load",
            F.explode(
                F.sequence(F.lit(1), F.col("floor_limit") - F.col("load"))
            ).alias("_f"),
        )
        .withColumn("_prio", F.col("load") + F.col("_f"))
    )
    w_slot = Window.orderBy(F.asc("_prio"), F.asc("node_id"), F.asc("_f"))
    slots = slots.withColumn(
        "_slot_rank", F.row_number().over(w_slot)
    ).select("_slot_rank", F.col("node_id").alias("_to_node"))

    moved = (
        takes.crossJoin(F.broadcast(d_capped))
        .filter(F.col("_take_rank") <= F.col("d"))
        .join(
            F.broadcast(slots),
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
            ).alias("move_size")
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
    in span-id order. Output mirrors ``balance_spans``."""
    survivors = nodes.filter(F.col("node_id") != drained)
    loads = (
        survivors.join(
            assign.groupBy("node_id").agg(F.count(F.lit(1)).alias("load")),
            "node_id", "left",
        ).select("node_id", F.coalesce("load", F.lit(0)).alias("load"))
    )
    victims = assign.filter(F.col("node_id") == drained)
    d = victims.agg(F.count(F.lit(1)).alias("d"))
    # slots: enough fills per survivor to cover the whole drained load
    slots = (
        loads.crossJoin(F.broadcast(d))
        .select(
            "node_id", "load",
            F.explode(F.sequence(F.lit(1), F.col("d"))).alias("_f"),
        )
        .withColumn("_prio", F.col("load") + F.col("_f"))
    )
    w_slot = Window.orderBy(F.asc("_prio"), F.asc("node_id"), F.asc("_f"))
    slots = slots.withColumn(
        "_slot_rank", F.row_number().over(w_slot)
    ).select("_slot_rank", F.col("node_id").alias("_to_node"))

    w_take = Window.orderBy(F.asc("span_id"))
    moved = (
        victims.withColumn("_take_rank", F.row_number().over(w_take))
        .join(F.broadcast(slots),
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
