SELECT * FROM (VALUES
('t002', 'INT, INT', '2', '1'),
('t002', 'INT, INT', '3', '6'),
('t003', 'INT, INT', '1', '1'),
('t003', 'INT, INT', '2', '1')
) AS t(tc, ty, c0, c1)