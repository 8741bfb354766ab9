SELECT * FROM (VALUES
('t001', 'INT, DECIMAL(2,1)', CAST(NULL AS VARCHAR), '1.0'),
('t003', 'INT, DECIMAL(2,1)', '4', '5.0')
) AS t(tc, ty, c0, c1)