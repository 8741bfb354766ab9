SELECT * FROM (VALUES
('t008', 'STRING', 'selected content')
) AS t(tc, ty, c0)