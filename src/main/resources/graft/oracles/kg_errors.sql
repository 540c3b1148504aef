SELECT CAST(error_class AS VARCHAR) AS error_class, CAST(n AS BIGINT) AS n FROM (VALUES
('NotFullyParsed',107)
) AS t(error_class, n)