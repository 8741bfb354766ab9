SELECT * FROM (VALUES
('t008', 'BOOLEAN', 'true'),
('t010', 'BOOLEAN', 'true'),
('t020', 'BOOLEAN', 'true'),
('t022', 'BOOLEAN', 'true'),
('t032', 'BOOLEAN', 'true'),
('t034', 'BOOLEAN', 'true'),
('t044', 'BOOLEAN', 'true'),
('t046', 'BOOLEAN', 'true'),
('t056', 'BOOLEAN', 'true'),
('t058', 'BOOLEAN', 'true'),
('t068', 'BOOLEAN', 'true'),
('t070', 'BOOLEAN', 'true'),
('t080', 'BOOLEAN', 'true'),
('t082', 'BOOLEAN', 'true'),
('t092', 'BOOLEAN', 'true'),
('t094', 'BOOLEAN', 'true')
) AS t(tc, ty, c0)