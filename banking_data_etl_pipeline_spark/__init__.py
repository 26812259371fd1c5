"""banking_data_etl_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
(Mamidi7/banking-data-etl-pipeline, an Apache Beam batch ETL over the
UCI Bank Marketing dataset — see ``/root/reference/batch_processing/
batch_pipeline1.py``) as idiomatic Spark DataFrame pipelines, and
extends them with the large-scale training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis, multimodal
plumbing, structured streaming).

Design stance (SURVEY.md §7):
- DataFrame/SQL only; zero row-at-a-time Python UDFs in any hot path.
- The reference's exception-based error side-outputs become data: an
  ``_errors`` array column accumulated per stage, split at the end.
- Every operator is a pure ``Column``-expression builder so Catalyst
  can fold constants, prune columns and push filters into the scan.
- The core bank pipeline is a single shuffle-free narrow stage.
"""

__version__ = "0.1.0"
