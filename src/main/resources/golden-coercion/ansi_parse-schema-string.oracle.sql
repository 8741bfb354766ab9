SELECT * FROM (VALUES
('t000', 'STRUCT<create: INT>', '{1}'),
('t001', 'STRUCT<cube: INT>', '{1}'),
('t002', 'STRUCT<create: INT>', '{1}'),
('t003', 'STRUCT<cube: INT>', '{1}')
) AS t(tc, ty, c0)