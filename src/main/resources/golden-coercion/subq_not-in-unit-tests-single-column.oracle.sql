SELECT * FROM (VALUES
('t002', 'INT, DECIMAL(2,1)', CAST(NULL AS VARCHAR), '1.0'),
('t002', 'INT, DECIMAL(2,1)', '2', '3.0'),
('t002', 'INT, DECIMAL(2,1)', '4', '5.0'),
('t006', 'INT, DECIMAL(2,1)', '2', '3.0'),
('t007', 'INT, DECIMAL(2,1)', CAST(NULL AS VARCHAR), '1.0'),
('t007', 'INT, DECIMAL(2,1)', '2', '3.0'),
('t007', 'INT, DECIMAL(2,1)', '4', '5.0'),
('t008', 'INT, DECIMAL(2,1)', CAST(NULL AS VARCHAR), '1.0'),
('t009', 'INT, DECIMAL(2,1)', '2', '3.0')
) AS t(tc, ty, c0, c1)