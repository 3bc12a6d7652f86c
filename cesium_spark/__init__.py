"""cesium_spark — a from-scratch, PySpark-native time-series rollup /
downsample / retention engine with the query and data-processing
capabilities of the reference (stefanv/cesium, an open-source platform
for time-series feature inference).

Reference parity map (see SURVEY.md §2; citations use the
``cesium/<path>::<symbol>`` convention because the reference mount was
empty at survey time — SURVEY.md §0):

- ``cesium_spark.functions.features``   ≙ cesium/features/common_functions.py,
  cadence_features.py (numpy kernels, GENERAL + CADENCE families)
- ``cesium_spark.functions.lomb_scargle`` ≙ cesium/features/lomb_scargle.py
- ``cesium_spark.functions.registry``   ≙ cesium/features/graphs.py::dask_feature_graph
- ``cesium_spark.operators.derive``     ≙ cesium/time_series.py::TimeSeries (t/m/e model)
- ``cesium_spark.operators.rollup``     ≙ cesium/featurize.py::featurize_time_series
- ``cesium_spark.sources``              ≙ cesium/data_management.py
- ``cesium_spark.codecs``               — engine-side (Gorilla VLDB'15), no ref counterpart
- ``cesium_spark.plans``                — engine-side (ledger/resume), no ref counterpart

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst;
vectorized pandas/Arrow UDFs only for the numpy feature kernels and the
codecs; no per-row Python anywhere.
"""

__version__ = "0.1.0"
