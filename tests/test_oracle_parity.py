"""t2-style differential test: every registered query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, run_oracle
from ticdc_spark.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + "\n".join(problems)


def test_all_queries_have_oracles():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may legitimately omit oracles; keep the list
    # explicit so omissions are intentional.
    # iterative EM trainers (llm/unigram.py) — the driver records a
    # rows-only check; correctness is pinned by tests/test_unigram.py's
    # exhaustive-enumeration Viterbi oracle + determinism tests
    allowed_missing: set[str] = {"unigram_train_pieces",
                                 "unigram_tokenize_stats",
                                 "unigram_train_pieces_full_em"}
    assert missing <= allowed_missing, f"queries without oracle: {missing}"
