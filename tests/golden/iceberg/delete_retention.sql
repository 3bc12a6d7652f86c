DELETE FROM catalog.db.features_1m WHERE window_start < TIMESTAMP '2024-01-01 00:00:00'
