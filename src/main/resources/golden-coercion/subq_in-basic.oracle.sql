SELECT * FROM (VALUES
('t005', 'BIGINT', '1'),
('t006', 'BIGINT', '3')
) AS t(tc, ty, c0)