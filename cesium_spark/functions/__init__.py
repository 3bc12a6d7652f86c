"""Feature kernels (GENERAL / CADENCE / LOMB_SCARGLE families) and the
feature registry. Pure numpy — importable on executors without Spark.
"""
