"""hogzilla_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference anomaly-IDS (pauloangelo/hogzilla, surveyed in SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
map-typed histogram state, broadcast semi/anti joins, pyspark.ml for the
clustering/classification layer, and Structured Streaming for the
continuous paths.  Nothing in here is a port; the reference only defines
WHAT to compute.
"""

__version__ = "0.1.0"

from hogzilla_spark.session import get_spark  # noqa: F401
