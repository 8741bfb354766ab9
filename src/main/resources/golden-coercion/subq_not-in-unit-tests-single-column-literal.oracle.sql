SELECT * FROM (VALUES
('t004', 'INT, DECIMAL(2,1)', '2', '3.0')
) AS t(tc, ty, c0, c1)