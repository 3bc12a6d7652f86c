CREATE TABLE IF NOT EXISTS catalog.db.features_1h (
  `conv_id` STRING,
  `channel` STRING,
  `window_start` TIMESTAMP,
  `mean` DOUBLE,
  `std` DOUBLE,
  `n` BIGINT
) USING iceberg
PARTITIONED BY (days(`window_start`), bucket(64, `conv_id`))
TBLPROPERTIES ('format-version' = '2', 'write.distribution-mode' = 'hash')
