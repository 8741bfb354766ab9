SELECT * FROM (VALUES
('t003', 'STRING, DOUBLE', 'val1a', '11.0'),
('t003', 'STRING, DOUBLE', 'val1d', '10.0'),
('t004', 'STRING, BIGINT', 'val1d', '10'),
('t004', 'STRING, BIGINT', 'val1a', '22'),
('t004', 'STRING, BIGINT', 'val1e', '10'),
('t005', 'BIGINT', '4', CAST(NULL AS VARCHAR)),
('t006', 'STRING, SMALLINT', 'val1a', '16'),
('t006', 'STRING, SMALLINT', 'val1b', '8'),
('t006', 'STRING, SMALLINT', 'val1c', '8'),
('t006', 'STRING, SMALLINT', 'val1d', '10'),
('t007', 'STRING, SMALLINT', 'val1a', '6'),
('t007', 'STRING, SMALLINT', 'val1a', '16'),
('t007', 'STRING, SMALLINT', 'val1a', '16'),
('t007', 'STRING, SMALLINT', 'val1a', '6')
) AS t(tc, ty, c0, c1)