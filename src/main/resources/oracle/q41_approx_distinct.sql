SELECT CAST(exact_customers AS BIGINT) AS exact_customers, CAST(approx_customers AS BIGINT) AS approx_customers
FROM (VALUES
  (1500,1494)
) t(exact_customers, approx_customers)