SELECT * FROM (VALUES
('t003', 'STRING, SMALLINT, TIMESTAMP', 'val1a', '6', '2014-04-04 01:00:00'),
('t003', 'STRING, SMALLINT, TIMESTAMP', 'val1b', '8', '2014-05-04 01:01:00'),
('t003', 'STRING, SMALLINT, TIMESTAMP', 'val1c', '8', '2014-05-04 01:02:00.001'),
('t003', 'STRING, SMALLINT, TIMESTAMP', 'val1a', '6', '2014-04-04 01:02:00.001'),
('t004', 'STRING, SMALLINT, INT', 'val1b', '8', '16'),
('t005', 'STRING, SMALLINT, INT', 'val1a', '6', '8'),
('t006', 'STRING, SMALLINT, INT', 'val1b', '8', '16'),
('t006', 'STRING, SMALLINT, INT', 'val1c', '8', '16'),
('t007', 'BIGINT, SMALLINT', '2', '8', CAST(NULL AS VARCHAR)),
('t008', 'STRING, SMALLINT', 'val1b', '8', CAST(NULL AS VARCHAR)),
('t009', 'STRING, INT, BIGINT', 'val1a', '8', '10'),
('t009', 'STRING, INT, BIGINT', 'val1b', '16', '19'),
('t009', 'STRING, INT, BIGINT', 'val1c', '16', '19'),
('t009', 'STRING, INT, BIGINT', 'val1d', '16', '19'),
('t010', 'STRING, SMALLINT', 'val1a', '6', CAST(NULL AS VARCHAR)),
('t011', 'STRING, SMALLINT', 'val1a', '16', CAST(NULL AS VARCHAR)),
('t011', 'STRING, SMALLINT', 'val1d', '10', CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1, c2)