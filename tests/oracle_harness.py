"""Local replica of the driver's duckdb-oracle comparison (t2 gate).

Runs each registered query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares row count, column names, and values
(sorted by column name, order-insensitive, NULL/NaN-normalized)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from ticdc_spark.sources.changelog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _norm(v):
    """Dtype-faithful canonical value.

    Deliberately DOES NOT coerce int->float or round floats: the driver's
    gate hashes exact values, so an int64 Spark column vs a float64 oracle
    column (DuckDB HUGEINT/DECIMAL window sums land as float64) must FAIL
    here too, not be papered over.  bool is kept distinct from int.
    """
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return None
        return ("f", float(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


_KIND_NAMES = {"i": "int", "u": "int", "f": "float", "b": "bool"}


def _col_kinds(pdf: pd.DataFrame, cols) -> dict:
    return {c: _KIND_NAMES.get(pdf[c].dtype.kind, "other") for c in cols}


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    oracle_cols = sorted(oracle_pdf.columns)
    if spark_cols != oracle_cols:
        return [f"columns differ: spark={spark_cols} oracle={oracle_cols}"]
    spk = spark_df.toPandas()
    if len(spk) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spk)} oracle={len(oracle_pdf)}")
    # dtype-kind parity: int-vs-float column kind is a driver hash fail even
    # when every value is numerically equal.  Skip the check when either side
    # has nulls in the column (pandas promotes nullable ints to float64/object,
    # which is a representation artifact, not a query dtype skew — the
    # value-level compare below still catches real mismatches).
    sk, ok = _col_kinds(spk, spark_cols), _col_kinds(oracle_pdf, spark_cols)
    for c in spark_cols:
        if sk[c] != ok[c] and {sk[c], ok[c]} <= {"int", "float", "bool"}:
            if not (spk[c].isna().any() or oracle_pdf[c].isna().any()):
                problems.append(
                    f"column {c!r} dtype kind differs: spark={sk[c]} oracle={ok[c]}"
                )

    # Columns with nulls on either side get int->float leniency ONLY for
    # the null representation artifact (pandas stores nullable ints as
    # float64/object); everything else is exact.
    lenient = {
        c
        for c in spark_cols
        if (spk[c].isna().any() or oracle_pdf[c].isna().any())
        and {sk[c], ok[c]} <= {"int", "float", "other"}
        and {"int", "float"} & {sk[c], ok[c]}
    }

    def _cell(c, v):
        n = _norm(v)
        if c in lenient and isinstance(n, tuple) and len(n) == 2 and n[0] in ("i", "f"):
            return ("f", float(n[1]))
        return n

    def canon(pdf: pd.DataFrame):
        rows = [
            tuple(_cell(c, v) for c, v in zip(spark_cols, row))
            for row in pdf[spark_cols].itertuples(index=False, name=None)
        ]
        return sorted(rows, key=repr)

    a, b = canon(spk), canon(oracle_pdf)
    if a != b:
        shown = 0
        for x, y in zip(a, b):
            if x != y and shown < 3:
                problems.append(f"row differs:\n  spark : {x}\n  oracle: {y}")
                shown += 1
        if not problems:
            problems.append("value multisets differ")
    return problems
