"""commerce_logs_pipeline_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of Log-Tools/commerce-logs-pipeline,
re-expressed Spark-first (DataFrame/SQL/Catalyst, Arrow-vectorized UDFs).
"""

__version__ = "0.1.0"
