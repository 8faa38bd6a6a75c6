"""clv_data_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of VinzenzHormann/CLV_data_pipeline.

The reference is an Airflow + BigQuery + pandas CLV batch pipeline
(synthetic transactions -> RFM-T features -> data-quality firewall ->
BG/NBD + Gamma-Gamma scoring).  This package re-expresses that entire
capability surface — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) — as
idiomatic Spark DataFrame programs designed for 100 TB scale:
declarative plans for Catalyst, broadcast joins for small dims,
partial aggregation, Arrow-vectorized pandas UDFs only where built-in
functions cannot express the semantics (the BG/NBD 2F1 term).
"""

__version__ = "0.1.0"
