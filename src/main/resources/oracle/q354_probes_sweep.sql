SELECT CAST(probes AS INTEGER) AS probes, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_possible AS BIGINT) AS n_possible, CAST(recall_permille AS BIGINT) AS recall_permille
FROM (VALUES
  (1,72,100,720),
  (2,74,100,740),
  (4,84,100,840),
  (8,92,100,920)
) t(probes, n_hits, n_possible, recall_permille)