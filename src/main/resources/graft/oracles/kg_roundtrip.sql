SELECT CAST(blocks AS BIGINT) AS blocks, CAST(parsed AS BIGINT) AS parsed, CAST(identical AS BIGINT) AS identical, CAST(violations AS BIGINT) AS violations FROM (VALUES
(4972,4865,4865,0)
) AS t(blocks, parsed, identical, violations)