CALL catalog.system.expire_snapshots(table => 'db.features_1m', older_than => TIMESTAMP '2024-01-08 00:00:00', retain_last => 2)
