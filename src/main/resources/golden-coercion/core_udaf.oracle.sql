SELECT * FROM (VALUES
('t002', 'DOUBLE', '102.5')
) AS t(tc, ty, c0)