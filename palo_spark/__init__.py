"""palo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of baidu/palo (Apache Doris).

The reference (/root/reference, README_EN.md:6,16,26) is a distribution
pointer for Apache Doris, a shared-nothing MPP OLAP warehouse. This
package re-expresses that capability surface Spark-first:

- ``session``   — SparkSession factory with OLAP-tuned defaults (AQE, CBO,
                  runtime bloom filters; Doris's optimizer machinery is
                  Catalyst built-ins, SURVEY.md §4).
- ``catalog``   — table registry over parquet fixtures + managed tables.
- ``tables``    — the three Doris table models (DUPLICATE / UNIQUE /
                  AGGREGATE KEY, SURVEY.md §1.2) as insert-time semantics
                  + merge-on-read views.
- ``functions`` — Doris-name scalar/aggregate function stdlib, MySQL
                  dialect shims, sketch (bitmap/HLL) and behavioral
                  (retention/funnel) aggregates.
- ``operators`` — LLM-data-pipeline extensions: dedup, similarity search,
                  text analysis, multimodal columns.
- ``plans``     — rollup / materialized-view rewrite layer.
- ``sources``   — broker/stream-load-style batch ingest.
- ``streaming`` — routine-load-style continuous ingest (Structured
                  Streaming).
- ``suite``     — the driver-facing query inventory (queries + DuckDB
                  oracle SQL) covering SURVEY.md §2.
"""

from palo_spark.session import get_session  # noqa: F401
from palo_spark.catalog import load_table, register_views, TABLES  # noqa: F401
from palo_spark.tables import Table  # noqa: F401
from palo_spark.plans import Measure, Rollup, RollupCatalog  # noqa: F401
from palo_spark.sql_frontend import doris_sql, translate  # noqa: F401
from palo_spark.palo_session import PaloSession  # noqa: F401

__version__ = "0.2.0"
