"""spotify_tags_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL project ``averille-demo/spotify-tags-etl``
(surveyed in ``SURVEY.md``), extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal columns).

Design stance (SURVEY.md §7): a small library-style engine —
``SparkSession`` + explicit ``StructType`` schemas + pure DataFrame
transforms + a thin source/sink layer. No custom Catalyst rules; two
pandas UDFs total (deaccent-normalize, indel fuzz-ratio); everything else
is built-in so Catalyst/Tungsten pick the physical strategy.
"""

from spotify_tags_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
