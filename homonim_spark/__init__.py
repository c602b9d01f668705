"""homonim_spark — a PySpark-native surface-reflectance correction and
spatial-tiling engine with the query/data-processing capabilities of
leftfield-geospatial/homonim, re-expressed Spark-first.

The reference (/root/reference) is a single-machine, thread-pooled
rasterio/OpenCV CLI tool.  This engine is a distributed DataFrame pipeline
over tables of interleaved text+media documents: tiles are H3-style
cell-indexed, source↔reference pairing is a cell-ID hash join with explicit
halo exchange, and the kernel models run as vectorized pandas/Arrow UDFs.

Nothing here is a port: architecture, partitioning and join strategy are
Spark-native; only the *numerical semantics* (kernel-sum least squares,
masking, R² thresholding, dtype conversion) replicate the reference, with
file:line citations in docstrings.
"""

from homonim_spark.enums import Model, ProcCrs  # noqa: F401

__version__ = "0.1.0"
