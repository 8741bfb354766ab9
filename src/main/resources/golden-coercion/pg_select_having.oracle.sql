SELECT * FROM (VALUES
('t011', 'INT, STRING', '1', 'XXXX'),
('t011', 'INT, STRING', '3', 'bbbb'),
('t012', 'INT, STRING', '3', 'BBBB'),
('t012', 'INT, STRING', '3', 'bbbb'),
('t013', 'STRING, INT', 'XXXX', '0'),
('t013', 'STRING, INT', 'bbbb', '5'),
('t015', 'INT, INT', '0', '9'),
('t019', 'INT', '1', CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1)