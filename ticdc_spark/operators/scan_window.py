"""W4 — adaptive scan-window controller (`pkg/eventservice/scan_window.go`).

The reference throttles the event scanner by adapting the scan interval
to memory pressure: per congestion report it updates fast/slow usage
EMAs (`updateUsageEMALocked`, alphas 0.4/0.2, `ema = prev + a*(v-prev)`
`:678-687,793-795`), a bounded pressure score (`:689-704`), and trailing
30 s window stats (`memoryUsageWindow.stats` `:259-285`), then walks a
branch chain: critical/emergency brake (`tryCriticalBrakeLocked`
`:602-642`), high/sustained-pressure reduction (`:711-731`),
floor recovery (`:653-676`), and very-low/low-pressure growth
(`OnCongestionReport` `:440-560`) with per-branch cooldowns.

Spark-first shape — this is a *sequential* per-changefeed state machine,
so it cannot be a parallel aggregate; but the tape it consumes is tiny
(one row per changefeed per second — control-plane volume), while the
expensive part (deriving per-tick usage from billions of events) is a
plain distributed groupBy.  So:

1. the **tape** (ts, ratio, release_count) per changefeed is derived
   from the changelog with one shuffle;
2. trailing-window stats (avg/max/cnt/span over 30 s) are *precomputed*
   with RANGE windows — they depend only on the tape, not on controller
   state, so they need not live inside the fold;
3. the controller itself is ONE ``aggregate`` higher-order fold over the
   per-changefeed tick array (collect_list + array_sort): a few thousand
   interpreted struct ops per changefeed, driver-scale work executed
   data-parallel per changefeed.

Engine portability (the DuckDB oracle runs the *same* fold through
``list_reduce``): the transition body is generated once and rendered per
dialect (integer division spelling, struct constructor); usage ratios
are dyadic rationals (k/128) so the RANGE-window sums are **exact** and
order-independent (DuckDB evaluates sliding aggregates with segment
trees — a non-dyadic double sum would differ in the last ulp from
Spark's running sum); the EMA/pressure float ops run in identical order
on both sides, so every output double is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Constants from scan_window.go:28-152,435-437 (durations in ms, times s).
DEFAULT_IV_MS = 5_000
MIN_IV_MS = 1_000
MAX_IV_MS = 1_800_000
PLATEAU_IV_MS = 15_000          # emergency-brake plateau = 3 * default
WINDOW_S = 30
ADJUST_COOLDOWN_S = 30
PRESSURE_COOLDOWN_S = 10
BRAKE_COOLDOWN_S = 10
RELEASE_RECOVERY_S = 15
VERY_LOW_RECOVERY_S = 90
FLOOR_RECOVERY_S = 5
MIN_INCREASE_SAMPLES = 10
MIN_INCREASE_SPAN_S = WINDOW_S * 4 // 5  # 24
EMERGENCY_UNLOCK_SAMPLES = 3

_NEG_INF_TS = -1_000_000_000  # time.Time zero-value stand-in

# Simulated horizon: the controller consumes 1 Hz congestion reports, so
# the tape is bounded by wall-clock seconds, not by data volume — the
# distributed part (per-tick usage aggregation) still scans everything.
SIM_HORIZON_S = 600

# The unified fold-element struct: tape inputs + controller state.
# DuckDB's list_reduce has no separate init value (the accumulator takes
# the first element's type), so both element and state share one shape.
_FIELDS = [
    ("ts", "bigint"), ("lastr", "double"), ("avgr", "double"),
    ("mxr", "double"), ("cnt", "bigint"), ("span", "bigint"),
    ("rel", "bigint"),
    ("fast", "double"), ("slow", "double"), ("init", "bigint"),
    ("p", "double"), ("la", "bigint"), ("ld", "bigint"),
    ("lc", "bigint"), ("li", "bigint"), ("cur", "bigint"),
    ("nb", "bigint"), ("nh", "bigint"), ("nsu", "bigint"),
    ("nvl", "bigint"), ("nlr", "bigint"), ("nn", "bigint"),
]

_INIT_STATE = {
    "ts": "0", "lastr": "0.0", "avgr": "0.0", "mxr": "0.0",
    "cnt": "0", "span": "0", "rel": "0",
    "fast": "0.0", "slow": "0.0", "init": "0", "p": "0.0",
    "la": "-1", "ld": "-1",
    "lc": str(_NEG_INF_TS), "li": str(_NEG_INF_TS),
    "cur": str(DEFAULT_IV_MS),
    "nb": "0", "nh": "0", "nsu": "0", "nvl": "0", "nlr": "0", "nn": "0",
}


def _mk_struct(fields: dict[str, str], dialect: str) -> str:
    if dialect == "spark":
        inner = ", ".join(f"'{k}', cast({v} as {t})"
                          for (k, t), v in zip(_FIELDS, fields.values()))
        return f"named_struct({inner})"
    inner = ", ".join(f"{k} := CAST({v} AS {t.upper()})"
                      for (k, t), v in zip(_FIELDS, fields.values()))
    return f"struct_pack({inner})"


def _force_double_literals(expr: str) -> str:
    """Rewrite bare float literals to ``Ne0`` scientific form.

    Both engines type ``0.55`` as DECIMAL; inside DuckDB list_reduce
    lambdas the decimal/double promotion mis-binds comparisons (a
    double that rounds to the threshold at the literal's scale compares
    >=), so every literal must be an explicit DOUBLE.
    """
    import re

    return re.sub(r"(?<![\w.])(\d+\.\d+)(?![e\w.])", r"\1e0", expr)


def _build(dialect: str) -> tuple[dict[str, str], dict[str, str]]:
    """Fragments + output fields for the OnCongestionReport step.

    Heavy shared sub-expressions are referenced by «TOKEN» placeholders:
    Spark's HOF lambda has no let-binding, so they are inlined
    (:func:`_transition`); the DuckDB recursive CTE binds each once per
    row as a layered column (:func:`oracle_sql`) — same IEEE ops, named
    instead of repeated.
    """
    D = "div" if dialect == "spark" else "//"

    frags: dict[str, str] = {}
    # EMA update happens before everything else (scan_window.go:452).
    frags["F1"] = ("CASE WHEN acc.init = 0 THEN x.lastr "
                   "ELSE acc.fast + 0.4 * (x.lastr - acc.fast) END")
    frags["S1"] = ("CASE WHEN acc.init = 0 THEN x.lastr "
                   "ELSE acc.slow + 0.2 * (x.lastr - acc.slow) END")

    # Critical brake (:602-642): cooldown 10 s on lastCriticalTime.
    is_emerg = "x.lastr > 0.98"
    frags["BRAKED"] = (f"((x.ts - acc.lc) >= {BRAKE_COOLDOWN_S} "
                       f"AND ({is_emerg} OR x.lastr > 0.9))")
    allow_min = (f"(acc.cur <= {DEFAULT_IV_MS} AND x.cnt >= "
                 f"{EMERGENCY_UNLOCK_SAMPLES} AND («F1») >= 0.9)")
    emerg_iv = (
        f"CASE WHEN acc.cur <= {DEFAULT_IV_MS} AND {allow_min} "
        f"THEN greatest(acc.cur {D} 2, {MIN_IV_MS}) "
        f"WHEN acc.cur <= {6 * DEFAULT_IV_MS} "
        f"THEN least(greatest(acc.cur {D} 2, {DEFAULT_IV_MS}), acc.cur) "
        f"ELSE greatest(acc.cur {D} 4, {PLATEAU_IV_MS}) END"
    )
    crit_iv = f"least(greatest(acc.cur {D} 2, {DEFAULT_IV_MS}), acc.cur)"
    frags["BIV"] = f"CASE WHEN {is_emerg} THEN ({emerg_iv}) ELSE ({crit_iv}) END"

    # Pressure score (:689-709) — untouched when the brake fires.
    p1 = (
        "CASE WHEN («F1») >= 0.75 OR («S1») >= 0.75 OR x.lastr >= 0.7 "
        "THEN least(acc.p + 2, 8.0) "
        "WHEN («F1») >= 0.55 OR («S1») >= 0.55 OR x.avgr >= 0.55 "
        "THEN least(acc.p + 1, 8.0) "
        "WHEN («F1») < 0.30 AND («S1») < 0.25 AND x.lastr < 0.30 "
        "THEN greatest(0.0, acc.p - 1.5) "
        "ELSE greatest(0.0, acc.p - 0.5) END"
    )
    frags["P2"] = (
        f"CASE WHEN «BRAKED» THEN acc.p "
        f"WHEN x.rel > 0 THEN greatest(0.0, ({p1}) - least(x.rel * 2.0, 8.0)) "
        f"ELSE ({p1}) END"
    )

    # Reduction branches (:711-731), growth branches (:494-560,653-676).
    frags["HIOK"] = (f"((x.ts - acc.ld) >= {PRESSURE_COOLDOWN_S} AND "
                     f"((«F1») >= 0.75 OR («S1») >= 0.75 OR x.lastr >= 0.7))")
    frags["HIIV"] = f"least(greatest(acc.cur * 3 {D} 4, {DEFAULT_IV_MS}), acc.cur)"
    frags["SUOK"] = (
        f"((x.ts - acc.ld) >= {PRESSURE_COOLDOWN_S} AND («P2») >= 3.0 AND "
        f"((«F1») >= 0.55 OR («S1») >= 0.55 OR x.avgr >= 0.55))"
    )
    frags["SUIV"] = f"least(greatest(acc.cur * 9 {D} 10, {DEFAULT_IV_MS}), acc.cur)"
    frags["FLIV"] = f"least(acc.cur * 5 {D} 4, {MAX_IV_MS})"
    fl_ok = (
        f"(acc.cur <= {DEFAULT_IV_MS} AND (x.ts - acc.la) >= {FLOOR_RECOVERY_S} "
        f"AND (x.ts - acc.ld) >= {FLOOR_RECOVERY_S} AND x.cnt >= 3 "
        f"AND x.lastr < 0.35 AND x.avgr < 0.55 "
        f"AND («F1») < 0.45 AND («S1») < 0.40 AND («P2») < 1.5)"
    )
    frags["FLTK"] = f"({fl_ok} AND («FLIV») > acc.cur)"
    frags["INCOK"] = (
        f"((x.ts - acc.la) >= {ADJUST_COOLDOWN_S} AND "
        f"(x.ts - acc.ld) >= {RELEASE_RECOVERY_S} AND "
        f"x.cnt >= {MIN_INCREASE_SAMPLES} AND x.span >= {MIN_INCREASE_SPAN_S} "
        f"AND («P2») < 1.0)"
    )
    frags["VLIV"] = (
        f"least(CASE WHEN acc.cur >= 120000 THEN acc.cur * 11 {D} 10 "
        f"WHEN acc.cur >= 60000 THEN acc.cur * 6 {D} 5 "
        f"ELSE acc.cur * 3 {D} 2 END, {MAX_IV_MS})"
    )
    vl_ok = (
        "(x.mxr < 0.1 AND x.avgr < 0.1 AND («F1») < 0.1 AND («S1») < 0.1 "
        f"AND (x.ts - acc.li) >= {VERY_LOW_RECOVERY_S})"
    )
    frags["VLTK"] = f"({vl_ok} AND («VLIV») > acc.cur)"
    frags["LOIV"] = (
        f"least(CASE WHEN acc.cur >= 120000 THEN acc.cur * 21 {D} 20 "
        f"WHEN acc.cur >= 60000 THEN acc.cur * 11 {D} 10 "
        f"ELSE acc.cur * 5 {D} 4 END, {MAX_IV_MS})"
    )
    lo_ok = (
        f"(acc.cur < {MAX_IV_MS} AND x.mxr < 0.2 AND x.avgr < 0.2 "
        "AND («F1») < 0.23 AND («S1») < 0.22)"
    )
    frags["LOTK"] = f"({lo_ok} AND («LOIV») > acc.cur)"

    # Decision code — precedence mirrors the return order in
    # OnCongestionReport (brake, high, sustained, floor-recovery,
    # increase gate, very-low, low, none).
    frags["DEC"] = (
        "CASE WHEN «BRAKED» THEN 1 WHEN «HIOK» THEN 2 WHEN «SUOK» THEN 3 "
        "WHEN «FLTK» THEN 4 WHEN NOT «INCOK» THEN 0 "
        "WHEN «VLTK» THEN 5 WHEN «LOTK» THEN 6 ELSE 0 END"
    )

    one0 = "THEN 1 ELSE 0 END"
    out = {
        "ts": "x.ts", "lastr": "x.lastr", "avgr": "x.avgr", "mxr": "x.mxr",
        "cnt": "x.cnt", "span": "x.span", "rel": "x.rel",
        "fast": "«F1»", "slow": "«S1»", "init": "1",
        "p": "«P2»",
        "la": "CASE WHEN «DEC» <> 0 THEN x.ts ELSE acc.la END",
        "ld": "CASE WHEN «DEC» IN (1, 2, 3) THEN x.ts ELSE acc.ld END",
        "lc": "CASE WHEN «DEC» = 1 THEN x.ts ELSE acc.lc END",
        "li": "CASE WHEN «DEC» IN (1, 2, 3) THEN x.ts ELSE acc.li END",
        "cur": (
            "CASE «DEC» WHEN 1 THEN («BIV») WHEN 2 THEN («HIIV») "
            "WHEN 3 THEN («SUIV») WHEN 4 THEN («FLIV») "
            "WHEN 5 THEN («VLIV») WHEN 6 THEN («LOIV») ELSE acc.cur END"
        ),
        "nb": f"acc.nb + CASE WHEN «DEC» = 1 {one0}",
        "nh": f"acc.nh + CASE WHEN «DEC» = 2 {one0}",
        "nsu": f"acc.nsu + CASE WHEN «DEC» = 3 {one0}",
        "nvl": f"acc.nvl + CASE WHEN «DEC» = 5 {one0}",
        "nlr": f"acc.nlr + CASE WHEN «DEC» IN (4, 6) {one0}",
        "nn": f"acc.nn + CASE WHEN «DEC» = 0 {one0}",
    }
    frags = {k: _force_double_literals(v) for k, v in frags.items()}
    out = {k: _force_double_literals(v) for k, v in out.items()}
    return frags, out


def _inline(expr: str, frags: dict[str, str]) -> str:
    """Recursively substitute «TOKEN» placeholders with their bodies."""
    changed = True
    while changed:
        changed = False
        for k, v in frags.items():
            token = f"«{k}»"
            if token in expr:
                expr = expr.replace(token, f"({v})")
                changed = True
    return expr


def _transition(dialect: str) -> dict[str, str]:
    frags, out = _build(dialect)
    return {k: _inline(v, frags) for k, v in out.items()}


def _transition_struct(dialect: str) -> str:
    return _mk_struct(_transition(dialect), dialect)


# Deterministic usage profile: phases cycle very-low → moderate →
# critical → cool-down so every controller branch fires.  Ratios are
# k/128 (dyadic) — exact in double, so window sums are order-independent.
_PROFILE = (
    "CASE (phase {D} 40) % 4 "
    "WHEN 0 THEN (4 + (load % 8)) "          # ~0.03-0.09: very low
    "WHEN 1 THEN (72 + (load % 16)) "        # ~0.56-0.68: moderate
    "WHEN 2 THEN (118 + (load % 14)) "       # ~0.92-1.03 → clamped 1.0
    "ELSE (20 + (load % 12)) END"            # ~0.16-0.25: low
)


def tape_sql() -> str:
    """Shared tape derivation (DuckDB dialect; Spark uses the DataFrame
    twin below). One row per (table, second-tick), dense re-indexed."""
    profile = _PROFILE.format(D="//")
    return f"""
  raw AS (SELECT table_name, commit_ts // 1000000 AS tick,
                 count(*) AS load
          FROM changelog GROUP BY table_name, commit_ts // 1000000),
  tape0 AS (SELECT table_name,
                   row_number() OVER (PARTITION BY table_name
                                      ORDER BY tick) - 1 AS ts,
                   load FROM raw),
  tape AS (SELECT * FROM tape0 WHERE ts < {SIM_HORIZON_S}),
  reports AS (SELECT table_name, ts,
                     least(CAST({profile} AS DOUBLE) / 128.0, 1.0) AS lastr,
                     CASE WHEN ts % 37 = 0 THEN load % 3 ELSE 0 END AS rel
              FROM (SELECT table_name, ts, load, ts AS phase FROM tape)),
  stats AS MATERIALIZED (SELECT table_name, ts, lastr, rel,
                   sum(lastr) OVER w / count(*) OVER w AS avgr,
                   max(lastr) OVER w AS mxr,
                   count(*) OVER w AS cnt,
                   ts - min(ts) OVER w AS span
            FROM reports
            WINDOW w AS (PARTITION BY table_name ORDER BY ts
                         RANGE BETWEEN {WINDOW_S} PRECEDING AND CURRENT ROW))
"""


def congestion_tape(cl: DataFrame) -> DataFrame:
    """Spark twin of :func:`tape_sql` — one shuffle for the per-tick
    aggregation, one per-changefeed window pass."""
    raw = (
        cl.groupBy("table_name", F.expr("commit_ts div 1000000").alias("tick"))
        .agg(F.count(F.lit(1)).alias("load"))
    )
    wt = Window.partitionBy("table_name").orderBy("tick")
    tape = (
        raw.select(
            "table_name", (F.row_number().over(wt) - 1).alias("ts"), "load",
        )
        .filter(F.col("ts") < SIM_HORIZON_S)
        .withColumn("phase", F.col("ts"))
    )
    profile = _PROFILE.format(D="div")
    reports = tape.select(
        "table_name", "ts",
        F.least(F.expr(profile).cast("double") / 128.0, F.lit(1.0)).alias("lastr"),
        F.when(F.col("ts") % 37 == 0, F.col("load") % 3)
        .otherwise(F.lit(0)).alias("rel"),
    )
    w = (
        Window.partitionBy("table_name").orderBy("ts")
        .rangeBetween(-WINDOW_S, 0)
    )
    return reports.select(
        "table_name", "ts", "lastr", "rel",
        (F.sum("lastr").over(w) / F.count(F.lit(1)).over(w)).alias("avgr"),
        F.max("lastr").over(w).alias("mxr"),
        F.count(F.lit(1)).over(w).alias("cnt"),
        (F.col("ts") - F.min("ts").over(w)).alias("span"),
    )


def fold_controller(stats: DataFrame) -> DataFrame:
    """Run the controller fold per changefeed; emit final state."""
    elem = _mk_struct(
        {
            "ts": "ts", "lastr": "lastr", "avgr": "avgr", "mxr": "mxr",
            "cnt": "cnt", "span": "span", "rel": "rel",
            "fast": "0.0", "slow": "0.0", "init": "0", "p": "0.0",
            "la": "-1", "ld": "-1", "lc": str(_NEG_INF_TS),
            "li": str(_NEG_INF_TS), "cur": str(DEFAULT_IV_MS),
            "nb": "0", "nh": "0", "nsu": "0", "nvl": "0", "nlr": "0",
            "nn": "0",
        },
        "spark",
    )
    init = _mk_struct(_INIT_STATE, "spark")
    folded = (
        stats.groupBy("table_name")
        .agg(F.expr(f"array_sort(collect_list({elem}))").alias("ticks"))
        .select(
            "table_name",
            F.expr(
                f"aggregate(ticks, {init}, (acc, x) -> {_transition_struct('spark')})"
            ).alias("st"),
        )
    )
    return folded.select(
        "table_name",
        F.col("st.cur").alias("final_interval_ms"),
        F.col("st.fast").alias("fast_ema"),
        F.col("st.slow").alias("slow_ema"),
        F.col("st.p").alias("pressure_score"),
        F.col("st.nb").alias("n_brake"),
        F.col("st.nh").alias("n_high_pressure"),
        F.col("st.nsu").alias("n_sustained"),
        F.col("st.nvl").alias("n_very_low_recovery"),
        F.col("st.nlr").alias("n_low_recovery"),
        F.col("st.nn").alias("n_none"),
    )


def oracle_sql(changelog_sql: str) -> str:
    """DuckDB rendering: same tape, same fold as a RECURSIVE CTE.

    DuckDB 1.0's ``list_reduce`` mis-evaluates threshold comparisons
    deep into long folds (verified: a single-step reduce with the same
    accumulator takes the correct branch, the full-list fold does not),
    so the sequential recurrence is WITH RECURSIVE — one iteration per
    tick joining the next stats row.  Shared fragments are bound once
    per row as layered columns; the arithmetic inside each is the same
    IEEE op sequence as Spark's inlined ``aggregate`` fold.
    """
    frags, out = _build("duck")
    colname = {k: ("decn" if k == "DEC" else k.lower()) for k in frags}

    def render(expr: str, avail: list[str]) -> str:
        for k in avail:
            expr = expr.replace(f"«{k}»", colname[k])
        return expr.replace("acc.", "a_").replace("x.", "")

    LAYERS = [
        ["F1", "S1", "BRAKED", "HIIV", "SUIV", "FLIV", "VLIV", "LOIV"],
        ["BIV", "P2", "HIOK", "VLTK", "LOTK"],
        ["SUOK", "FLTK", "INCOK"],
        ["DEC"],
    ]
    state_cols = [n for n, _ in _FIELDS]
    l1_inputs = ", ".join(
        [f"s.table_name AS table_name"]
        + [f"x.{c} AS {c}" for c in ("ts", "lastr", "avgr", "mxr",
                                     "cnt", "span", "rel")]
        + [f"s.{c} AS a_{c}" for c in state_cols if c not in
           ("ts", "lastr", "avgr", "mxr", "cnt", "span", "rel")]
    )
    l1_frags = ", ".join(
        f"{frags[k].replace('acc.', 's.')} AS {colname[k]}"
        for k in LAYERS[0]
    )
    inner = (f"SELECT {l1_inputs}, {l1_frags} "
             f"FROM sim s JOIN stats x "
             f"ON x.table_name = s.table_name AND x.ts = s.ts + 1")
    avail = list(LAYERS[0])
    for layer in LAYERS[1:]:
        defs = ", ".join(f"{render(frags[k], avail)} AS {colname[k]}"
                         for k in layer)
        inner = f"SELECT *, {defs} FROM ({inner})"
        avail += layer

    sel = ",\n         ".join(
        f"CAST({render(out[name], avail)} AS {t.upper()}) AS {name}"
        for name, t in _FIELDS
    )
    anchor = ",\n         ".join(
        f"CAST({_INIT_STATE[name]} AS {t.upper()}) AS {name}"
        if name != "ts" else "CAST(-1 AS BIGINT) AS ts"
        for name, t in _FIELDS
    )
    fields = ", ".join(name for name, _ in _FIELDS)
    return f"""
WITH RECURSIVE {changelog_sql},
{tape_sql()},
sim(table_name, {fields}) AS (
  SELECT table_name,
         {anchor}
  FROM (SELECT DISTINCT table_name FROM stats)
  UNION ALL
  SELECT table_name,
         {sel}
  FROM ({inner})),
final AS (
  SELECT * FROM sim
  QUALIFY ts = max(ts) OVER (PARTITION BY table_name))
SELECT table_name,
       cur AS final_interval_ms,
       fast AS fast_ema,
       slow AS slow_ema,
       p AS pressure_score,
       nb AS n_brake,
       nh AS n_high_pressure,
       nsu AS n_sustained,
       nvl AS n_very_low_recovery,
       nlr AS n_low_recovery,
       nn AS n_none
FROM final
"""


def fold_controller_pandas(stats: DataFrame) -> DataFrame:
    """Arrow-batched variant of :func:`fold_controller`.

    A per-changefeed sequential state machine is the documented
    Pandas-UDF exception (SURVEY §2.12 stateful ops): the fold is
    inherently serial within a group, groups are independent, and a
    Python loop over the control-plane tape (≤ SIM_HORIZON_S rows per
    changefeed) is ~50× faster than the interpreted 95 KB HOF
    expression while executing the *same* IEEE ops in the same order —
    ``test_scan_window.py`` pins all three implementations equal.
    """
    # Close over plain ints so the nested fn pickles by value (no
    # ticdc_spark import on the worker).
    default_iv, min_iv, max_iv = DEFAULT_IV_MS, MIN_IV_MS, MAX_IV_MS
    plateau_iv, neg_inf = PLATEAU_IV_MS, _NEG_INF_TS
    brake_cd, press_cd = BRAKE_COOLDOWN_S, PRESSURE_COOLDOWN_S
    floor_cd, adjust_cd = FLOOR_RECOVERY_S, ADJUST_COOLDOWN_S
    release_cd, vl_cd = RELEASE_RECOVERY_S, VERY_LOW_RECOVERY_S
    min_inc_n, min_inc_span = MIN_INCREASE_SAMPLES, MIN_INCREASE_SPAN_S
    unlock_n = EMERGENCY_UNLOCK_SAMPLES

    schema = (
        "table_name string, final_interval_ms long, fast_ema double, "
        "slow_ema double, pressure_score double, n_brake long, "
        "n_high_pressure long, n_sustained long, n_very_low_recovery long, "
        "n_low_recovery long, n_none long"
    )

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values("ts")
        fast = slow = p = 0.0
        init = False
        la = ld = -1
        lc = li = neg_inf
        cur = default_iv
        nb = nh = nsu = nvl = nlr = nn = 0
        for ts, lastr, avgr, mxr, cnt, span, rel in zip(
            pdf["ts"], pdf["lastr"], pdf["avgr"], pdf["mxr"],
            pdf["cnt"], pdf["span"], pdf["rel"],
        ):
            ts, cnt, span, rel = int(ts), int(cnt), int(span), int(rel)
            lastr, avgr, mxr = float(lastr), float(avgr), float(mxr)
            if not init:
                fast = slow = lastr
                init = True
            else:
                fast = fast + 0.4 * (lastr - fast)
                slow = slow + 0.2 * (lastr - slow)
            if (ts - lc) >= brake_cd and lastr > 0.9:
                if lastr > 0.98:
                    if cur <= default_iv and cnt >= unlock_n and fast >= 0.9:
                        cur = max(cur // 2, min_iv)
                    elif cur <= 6 * default_iv:
                        cur = min(max(cur // 2, default_iv), cur)
                    else:
                        cur = max(cur // 4, plateau_iv)
                else:
                    cur = min(max(cur // 2, default_iv), cur)
                lc = la = ld = li = ts
                nb += 1
                continue
            hot = fast >= 0.75 or slow >= 0.75 or lastr >= 0.7
            warm = fast >= 0.55 or slow >= 0.55 or avgr >= 0.55
            if hot:
                p = min(p + 2, 8.0)
            elif warm:
                p = min(p + 1, 8.0)
            elif fast < 0.30 and slow < 0.25 and lastr < 0.30:
                p = max(0.0, p - 1.5)
            else:
                p = max(0.0, p - 0.5)
            if rel > 0:
                p = max(0.0, p - min(rel * 2.0, 8.0))
            if (ts - ld) >= press_cd and hot:
                cur = min(max(cur * 3 // 4, default_iv), cur)
                la = ld = li = ts
                nh += 1
                continue
            if (ts - ld) >= press_cd and p >= 3.0 and warm:
                cur = min(max(cur * 9 // 10, default_iv), cur)
                la = ld = li = ts
                nsu += 1
                continue
            if (cur <= default_iv and (ts - la) >= floor_cd
                    and (ts - ld) >= floor_cd and cnt >= 3
                    and lastr < 0.35 and avgr < 0.55
                    and fast < 0.45 and slow < 0.40 and p < 1.5):
                nxt = min(cur * 5 // 4, max_iv)
                if nxt > cur:
                    cur, la = nxt, ts
                    nlr += 1
                    continue
            if not ((ts - la) >= adjust_cd and (ts - ld) >= release_cd
                    and cnt >= min_inc_n and span >= min_inc_span
                    and p < 1.0):
                nn += 1
                continue
            if (mxr < 0.1 and avgr < 0.1 and fast < 0.1 and slow < 0.1
                    and (ts - li) >= vl_cd):
                num, den = ((11, 10) if cur >= 120000 else
                            (6, 5) if cur >= 60000 else (3, 2))
                nxt = min(cur * num // den, max_iv)
                if nxt > cur:
                    cur, la = nxt, ts
                    nvl += 1
                    continue
            if (cur < max_iv and mxr < 0.2 and avgr < 0.2
                    and fast < 0.23 and slow < 0.22):
                num, den = ((21, 20) if cur >= 120000 else
                            (11, 10) if cur >= 60000 else (5, 4))
                nxt = min(cur * num // den, max_iv)
                if nxt > cur:
                    cur, la = nxt, ts
                    nlr += 1
                    continue
            nn += 1
        return pd.DataFrame([{
            "table_name": pdf["table_name"].iloc[0],
            "final_interval_ms": cur, "fast_ema": fast, "slow_ema": slow,
            "pressure_score": p, "n_brake": nb, "n_high_pressure": nh,
            "n_sustained": nsu, "n_very_low_recovery": nvl,
            "n_low_recovery": nlr, "n_none": nn,
        }])

    return stats.groupBy("table_name").applyInPandas(run, schema)
