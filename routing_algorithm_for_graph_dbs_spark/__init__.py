"""PySpark-native analytics engine with the query surface of the reference
multimodal-transport routing project (Giacomo117/Routing-Algorithm-for-Graph-DBs).

The reference models GTFS public-transport data as a Neo4j property graph and
answers routing/analytics queries with Cypher + APOC + GDS. This engine
re-expresses the same data model and query surface as idiomatic PySpark:

- entity tables -> DataFrames (Parquet at rest), relationships -> join keys or
  derived edge DataFrames;
- Cypher MATCH chains -> declarative DataFrame joins (Catalyst optimizes);
- GDS graph projection -> cached vertices/edges DataFrames keyed by (day, speed);
- GDS Dijkstra / APOC Dijkstra / betweenness -> iterative DataFrame programs
  (Pregel pattern) in :mod:`routing_algorithm_for_graph_dbs_spark.graph`;
- plus large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) the reference does not have but a 100 TB
  deployment needs.

No RDDs, no row-at-a-time Python UDFs on hot paths; Pandas UDFs only where
built-in column functions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from routing_algorithm_for_graph_dbs_spark.session import get_spark  # noqa: F401
