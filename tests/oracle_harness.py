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
    if v is None:
        return None
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return None
        return round(float(v), 9)
    if isinstance(v, (int, np.integer)):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


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

    def canon(pdf: pd.DataFrame):
        rows = [
            tuple(_norm(v) for v in row)
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
