SELECT CAST(is_dup AS INTEGER) AS is_dup, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_clusters AS BIGINT) AS n_clusters, CAST(matches_rebuild AS INTEGER) AS matches_rebuild
FROM (VALUES
  (0,439,439,1),
  (1,22,21,1)
) t(is_dup, n_docs, n_clusters, matches_rebuild)