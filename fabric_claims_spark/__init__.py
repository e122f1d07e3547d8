"""fabric_claims_spark — a PySpark-native analytics engine.

Re-implements the computational semantics of the reference healthcare
claims platform (``lkv971/fabric-claims``, medallion bronze/silver/gold
plus a BI metrics layer) as one idiomatic PySpark library, and extends
it with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design rules (enforced throughout):

* DataFrame/SQL only — logical plans go to Catalyst; no RDDs.
* Built-in ``pyspark.sql.functions`` in hot paths; Arrow-vectorized
  pandas UDFs only where no native expression exists.
* Broadcast small dimensions, pre-aggregate before shuffles, never use
  partitionless windows on fact-sized data.
* Storage is Delta when available, with a transactional parquet
  fallback exposing the same MERGE semantics (``sources.merge``).
"""

__version__ = "0.1.0"

from fabric_claims_spark.session import get_spark  # noqa: F401
