"""record_linkage_ldu_spark — a PySpark-native entity-resolution engine.

A from-scratch, Spark-first re-expression of the semantics of the
reference record-linkage pipeline (Tommer-R/Record-linkage-LDU):
normalization -> blocking -> pairwise similarity scoring -> match rules
-> transitive clustering, over Iceberg/Parquet tables of interleaved
text+media documents ``(doc_id, spans)``.

Design principles (see SURVEY.md):
  * DataFrame/SQL declarative plans; Catalyst/AQE do the physical work.
  * All normalizers are native Column expression chains (no Python UDF).
  * The only Python compute is one Arrow-vectorized pandas UDF for the
    sequence-similarity kernels (Ratcliff-Obershelp, Jaro-Winkler).
  * Blocked candidate generation replaces the reference's cartesian
    pair index; skew is handled with block caps + AQE.
  * Transitive closure is an iterative DataFrame connected-components
    loop (no driver-side Python grouping).
"""

__version__ = "0.1.0"
