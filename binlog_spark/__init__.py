"""binlog_spark — a PySpark-native CDC ingest engine.

From-scratch reimplementation of the query/data-processing capabilities of
santhosh-tekuri/binlog (MySQL binlog RBR decode) as an idiomatic Spark
pipeline: vectorized chunk decode -> GTID dedup -> commit-order apply ->
exactly-once MERGE into a lake table.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
