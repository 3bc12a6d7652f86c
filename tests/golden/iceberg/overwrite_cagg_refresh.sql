INSERT OVERWRITE catalog.db.features_1h
SELECT * FROM __src_features_1h
