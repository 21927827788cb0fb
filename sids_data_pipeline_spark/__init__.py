"""sids_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the UNDP-Data/sids-data-pipeline reference (zonal statistics
over rasters/vectors, incremental manifests, vector-tile export), extended
with the operators a large-scale LLM training-data pipeline needs
(deduplication, similarity search, multimodal columns, text analysis).

Design rules (see ARCHITECTURE.md):
- DataFrame/SQL first; Catalyst owns the physical plan.
- Pandas UDFs (Arrow-batched) only for kernels Spark cannot express
  (geometry refinement, raster decode, PBF encode).
- Every operator is written for a 1000-executor / 100 TB deployment and
  merely *tested* on local[32]: broadcast small sides, partition-pruned
  scans, map-side partial aggregation, no driver-side collect loops.
"""

__version__ = "0.1.0"

from sids_data_pipeline_spark.session import get_spark  # noqa: F401
