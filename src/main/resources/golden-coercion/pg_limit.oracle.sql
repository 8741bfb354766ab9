SELECT * FROM (VALUES
('t000', 'STRING, INT, INT, STRING', '', '51', '76', 'ZBAAAA'),
('t000', 'STRING, INT, INT, STRING', '', '52', '985', 'ACAAAA'),
('t001', 'STRING, INT, INT, STRING', '', '61', '560', 'JCAAAA'),
('t001', 'STRING, INT, INT, STRING', '', '62', '633', 'KCAAAA'),
('t001', 'STRING, INT, INT, STRING', '', '63', '296', 'LCAAAA'),
('t001', 'STRING, INT, INT, STRING', '', '64', '479', 'MCAAAA'),
('t001', 'STRING, INT, INT, STRING', '', '65', '64', 'NCAAAA'),
('t002', 'STRING, INT, INT, STRING', '', '61', '560', 'JCAAAA'),
('t002', 'STRING, INT, INT, STRING', '', '62', '633', 'KCAAAA')
) AS t(tc, ty, c0, c1, c2, c3)