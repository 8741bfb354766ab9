SELECT * FROM (VALUES
('t002', 'STRING, INT, INT', 'one', '1', '1'),
('t002', 'STRING, INT, INT', 'one', '1', '5'),
('t003', 'STRING, INT, INT', 'one', '1', '1'),
('t003', 'STRING, INT, INT', 'one', '1', '5'),
('t003', 'STRING, INT, INT', 'two', '2', '22'),
('t003', 'STRING, INT, INT', 'three', '3', CAST(NULL AS VARCHAR)),
('t004', 'STRING, INT, INT', 'one', '1', '1'),
('t004', 'STRING, INT, INT', 'one', '1', '5'),
('t004', 'STRING, INT, INT', 'two', '2', '22'),
('t005', 'BIGINT', '4', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1, c2)