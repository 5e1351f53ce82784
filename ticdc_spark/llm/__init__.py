from ticdc_spark.llm.text import tokens_col, shingles_col  # noqa: F401
from ticdc_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)
from ticdc_spark.llm.similarity import brute_force_knn, lsh_buckets  # noqa: F401
