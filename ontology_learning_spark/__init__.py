"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference system (itssnehin/Ontology-Learning): a
deterministic, columnar DataFrame pipeline that reads interleaved
text+media document tables, extracts concept mentions and relation
triples with vectorized Arrow UDFs, links mentions to an entity catalog
via blocked scored joins, decides EXTEND/MAP/UNCERTAIN per the
reference's threshold cascade, canonicalizes aliases with an iterative
connected-components loop, and materializes partitioned graph tables
with lineage + a checkpoint manifest.

Built exclusively on the public PySpark DataFrame/SQL API.
"""

__version__ = "0.1.0"
