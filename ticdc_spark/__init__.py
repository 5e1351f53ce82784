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
