SELECT CAST(category AS VARCHAR) AS category, CAST(n AS BIGINT) AS n, CAST(customers AS BIGINT) AS customers
FROM (VALUES
  ('Abbigliamento',206,136),
  ('Casa',193,124),
  ('Elettronica',203,135),
  ('Libri',200,128),
  ('Sport',198,130)
) t(category, n, customers)