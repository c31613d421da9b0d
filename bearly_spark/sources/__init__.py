"""Table sources for the bearly-spark engine."""

from bearly_spark.sources.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
