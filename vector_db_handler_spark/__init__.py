"""vector_db_handler_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference vector-store
service (``AlirezaFazli29/vector-db-handler``).

The reference is a FastAPI layer over Qdrant: a multi-tenant vector table
with exact-semantics CRUD, payload-filter predicates, and cosine top-k
search (reference: ``app/core/document_ingestor.py``).  This package
re-expresses that surface — plus the LLM-data-pipeline extension
operators (dedup, similarity search, text analysis, multimodal plumbing)
— as idiomatic Spark DataFrame programs:

* declarative plans the Catalyst optimizer can push down / prune / reorder,
* native (JVM, codegen-friendly) expressions for the vector math,
* tenant partitioning so every operator prunes to one tenant,
* broadcast joins for small dimension tables, AQE for runtime re-plan.

Designed for a 1000-executor cluster at ~100 TB; tested on local[*] at
the driver's synthetic scale factors.
"""

__version__ = "0.1.0"

from vector_db_handler_spark.session import get_spark  # noqa: F401
