SELECT * FROM (VALUES
('t000', 'STRING', 'void', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
('t001', 'STRING', 'boolean', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
('t002', 'STRING, STRING, STRING, STRING', 'tinyint', 'smallint', 'int', 'bigint'),
('t003', 'STRING, STRING, STRING', 'float', 'double', 'decimal(2,1)', CAST(NULL AS VARCHAR)),
('t004', 'STRING, STRING, STRING', 'date', 'timestamp', 'interval day', CAST(NULL AS VARCHAR)),
('t005', 'STRING, STRING', 'binary', 'string', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
('t006', 'STRING, STRING, STRING', 'array<int>', 'map<int,int>', 'struct<a:int,b:string>', CAST(NULL AS VARCHAR)),
('t007', 'VOID, VOID', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1, c2, c3)