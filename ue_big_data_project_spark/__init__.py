"""ue_big_data_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities demonstrated by the reference repo
``nathan-claeys/UE_BIG_DATA_PROJECT`` (a Kafka + PySpark open-data
pipeline project), re-expressed as a clean, testable, cluster-scale
library:

- ``session``    — SparkSession factory tuned for AQE / Arrow / UTC.
- ``schemas``    — explicit StructType registry per source (SURVEY §1.2).
- ``sources``    — batch & streaming Source API (kafka/file/rate/memory).
- ``functions``  — scalar kit (time, geo, text, vectors) as native
                   Catalyst expressions; UDFs only where unavoidable.
- ``operators``  — composite relational operators: as-of / range joins,
                   per-group top-k, dedup (exact/minhash/simhash/jaccard),
                   similarity search, haversine k-NN.
- ``queries``    — the reference's four declared queries + wind pipeline,
                   re-expressed over neutral fixture schemas.
- ``streaming``  — watermarked windowed aggregation, streaming dedup,
                   foreachBatch sinks, query lifecycle helpers.

Everything here is built only on the public Apache Spark / PySpark API.
"""

from ue_big_data_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
