"""semlink — a from-scratch PySpark-native record-linkage engine.

Recasts the capabilities of the public `semanticize/semanticizer` service
(n-gram anchor-dictionary entity linking: commonness / link probability /
sense probability / context-overlap features — Milne & Witten CIKM'08,
Meij et al. WSDM'12, Odijk et al. OAIR'13) as a Spark-first
blocking + pairwise-scoring + transitive-clustering pipeline over
multi-turn transcript tables, per BASELINE.json's north rule.

Design notes:
- DataFrame/SQL only; the sole Python↔JVM crossings are two vectorized
  Arrow/pandas UDF kernels (string metrics + pair scoring).
- Candidate generation is a broadcast hash join of exploded n-gram
  mentions against the anchor dictionary (the blocking step), with an
  explicit salted variant for skewed high-frequency surface forms.
- Clustering is iterative large-star/small-star connected components
  (Kiveris et al. SoCC'14), checkpointed per superstep and resumable.

See SURVEY.md for the full operator inventory and provenance tags.
"""

__version__ = "0.1.0"
