"""s2geography_spark — PySpark-native spherical spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
paleolimbot/s2geography (see SURVEY.md), expressed Spark-first: DataFrame/SQL
plans, vectorized Arrow/pandas UDFs for the geometry kernels, and explicit
cover->explode->join->refine spatial-join plans designed for 100 TB scale.
"""

__version__ = "0.1.0"
