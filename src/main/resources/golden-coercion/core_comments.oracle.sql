SELECT * FROM (VALUES
('t000', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t001', 'STRING, STRING', '/', 'selected content'),
('t002', 'STRING, STRING', '*', 'selected content'),
('t003', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t004', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t005', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t006', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t007', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t008', 'STRING', 'selected content', CAST(NULL AS VARCHAR)),
('t009', 'STRING', 'selected content', CAST(NULL AS VARCHAR))
) AS t(tc, ty, c0, c1)