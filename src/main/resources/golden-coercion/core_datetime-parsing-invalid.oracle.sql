SELECT * FROM (VALUES
('t018', 'STRUCT<date: DATE>', '{null}')
) AS t(tc, ty, c0)