SELECT * FROM (VALUES
('t000', 'BOOLEAN', 'true'),
('t001', 'BOOLEAN', 'true'),
('t002', 'BOOLEAN', 'true'),
('t003', 'BOOLEAN', 'true'),
('t004', 'BOOLEAN', 'true'),
('t005', 'BOOLEAN', 'true'),
('t006', 'BOOLEAN', 'true'),
('t007', 'BOOLEAN', 'true'),
('t008', 'BOOLEAN', 'true'),
('t009', 'BOOLEAN', 'true')
) AS t(tc, ty, c0)