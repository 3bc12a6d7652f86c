MERGE INTO catalog.db.turns_latest t
USING __src_turns s
ON t.`conv_id` = s.`conv_id` AND t.`turn_idx` = s.`turn_idx`
WHEN MATCHED THEN UPDATE SET t.`role` = s.`role`, t.`text` = s.`text`, t.`tool` = s.`tool`, t.`ts` = s.`ts`
WHEN NOT MATCHED THEN INSERT *
