"""realtime0523_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
real-time warehouse (SuperHeroBigData/realtime0523 — a Spark 2.x-style
DStream + Redis/HBase/Kafka pipeline) as an idiomatic PySpark engine:

- batch relational layer: DataFrame/SQL operators covering the
  reference's full operator inventory (SURVEY.md §2),
- streaming layer: Structured Streaming pipelines mirroring the
  ODS → DWD → DWS → ADS warehouse stages,
- LLM-data layer: dedup / similarity / text-analysis / multimodal
  operators for large-scale training-data pipelines.

Everything is public PySpark API; Catalyst + Tungsten provide the
optimizer and execution that the reference hand-rolled.
"""

__version__ = "0.1.0"
