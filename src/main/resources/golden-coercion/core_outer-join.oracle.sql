SELECT * FROM (VALUES
('t002', 'BIGINT, INT', '-769', '-1538'),
('t002', 'BIGINT, INT', '-800', '-1600'),
('t002', 'BIGINT, INT', '-507', '-1014'),
('t002', 'BIGINT, INT', '-367', '-734'),
('t005', 'INT', '97', CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1)