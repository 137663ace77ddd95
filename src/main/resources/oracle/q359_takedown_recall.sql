SELECT CAST(k AS BIGINT) AS k, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_possible AS BIGINT) AS n_possible, CAST(recall_permille AS BIGINT) AS recall_permille
FROM (VALUES
  (1,20,20,1000),
  (2,39,40,975),
  (3,58,60,966),
  (4,75,80,937),
  (5,93,100,930)
) t(k, n_hits, n_possible, recall_permille)