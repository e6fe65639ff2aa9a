"""otokuna_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference pipeline (alegonz/otokuna, surveyed in SURVEY.md), expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Pandas-UDF escape hatches only where built-in operators cannot express the
semantics.

Layout
------
- ``session``    SparkSession factory tuned for the 100 TB design point
- ``io``         table loading / parquet sources & sinks
- ``functions``  column-expression libraries (parsers, text, vectors)
- ``operators``  composite relational operators (dedup, outliers, top-k,
                 as-of join, similarity search, sampling)
- ``plans``      end-to-end queries and the otokuna serving pipeline
- ``sources``    non-parquet sources (HTML page UDTF, SJIS CSV, multimodal)
- ``streaming``  Structured Streaming jobs
- ``ml``         MLlib pipeline (GBT regressor, leaf-quantile estimator)
"""

__version__ = "0.1.0"
