SELECT * FROM (VALUES
('t000', 'STRUCT<a: INT, f: FLOAT>', '{1, 3.14}'),
('t001', 'STRUCT<time: TIMESTAMP>', '{2015-08-26 00:00:00}'),
('t007', 'STRUCT<_c0: INT, _c1: STRING>', '{1, abc}'),
('t008', 'STRING', 'STRUCT<_c0: INT, _c1: STRING>'),
('t013', 'STRING', '1,2'),
('t014', 'STRING', '26/08/2015')
) AS t(tc, ty, c0)