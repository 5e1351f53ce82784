"""ticdc_spark — a PySpark-native changelog/CDC analytics engine.

A from-scratch rebuild of the capabilities of pingcap/ticdc (reference at
/root/reference, studied for behavior only) on idiomatic PySpark:

- DataFrame/SQL declarative plans (Catalyst does pushdown/pruning/codegen)
- Structured Streaming for changefeeds (watermark = resolved-ts)
- foreachBatch for ordered / transactional sinks
- config-compiled Column expressions instead of an interpreter

Package layout mirrors SURVEY.md §2's operator inventory:

- ``sources/``   — changelog readers (S1..S7)
- ``operators/`` — filters (F1..F7), projections (P1..P6), folds (A1..A5),
                   ordering (O1..O3), routing (R1..R6), windows (W1..W3)
- ``codec/``     — wire encoders (canal-json, csv, open-protocol, debezium,
                   simple) per §2.11
- ``sinks/``     — mysql SQL-gen, cloud-storage layout, kafka shape, blackhole
- ``streaming/`` — changefeed lifecycle on Structured Streaming
- ``llm/``       — beyond-reference large-scale data-pipeline operators
                   (dedup, similarity search, text analysis, multimodal)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps ``import ticdc_spark`` free of a Spark
    session requirement): the objects a user touches first."""
    lazy = {
        "ChangefeedConfig": ("ticdc_spark.pipeline", "ChangefeedConfig"),
        "build_pipeline": ("ticdc_spark.pipeline", "build_pipeline"),
        "compile_changefeed": ("ticdc_spark.pipeline", "compile_changefeed"),
        "parse_changefeed_config": ("ticdc_spark.config",
                                    "parse_changefeed_config"),
        "ChangefeedRegistry": ("ticdc_spark.streaming.registry",
                               "ChangefeedRegistry"),
        "ApiServer": ("ticdc_spark.api", "ApiServer"),
        "get_spark": ("ticdc_spark.session", "get_spark"),
        "events_changelog": ("ticdc_spark.sources.changelog",
                             "events_changelog"),
        "ApiClient": ("ticdc_spark.client", "ApiClient"),
        "migrate_metadata": ("ticdc_spark.migrate", "migrate_metadata"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'ticdc_spark' has no attribute {name!r}")
