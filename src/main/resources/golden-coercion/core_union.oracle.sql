SELECT * FROM (VALUES
('t002', 'INT, STRING', '1', 'a'),
('t002', 'INT, STRING', '2', 'b'),
('t002', 'INT, STRING', '1', 'a'),
('t002', 'INT, STRING', '2', 'b'),
('t004', 'BIGINT', '0', CAST(NULL AS VARCHAR)),
('t004', 'BIGINT', '1', CAST(NULL AS VARCHAR)),
('t004', 'BIGINT', '0', CAST(NULL AS VARCHAR)),
('t008', 'INT, INT', '1', '1'),
('t008', 'INT, INT', '1', '1'),
('t012', 'DECIMAL(11,0)', '1', CAST(NULL AS VARCHAR)),
('t012', 'DECIMAL(11,0)', '2', CAST(NULL AS VARCHAR)),
('t013', 'DECIMAL(21,0)', '3', CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1)