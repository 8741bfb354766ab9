SELECT * FROM (VALUES
('t000', 'STRING', 'trailing'),
('t001', 'STRING', 'embedded'),
('t002', 'STRING', 'both'),
('t003', 'STRING', 'before multi-line'),
('t004', 'STRING', 'after multi-line'),
('t005', 'STRING', 'deeply nested example')
) AS t(tc, ty, c0)