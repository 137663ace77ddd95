SELECT CAST(bands AS INTEGER) AS bands, CAST(rows_per_band AS INTEGER) AS rows_per_band, CAST(n_candidate_edges AS BIGINT) AS n_candidate_edges, CAST(n_dup_docs AS BIGINT) AS n_dup_docs
FROM (VALUES
  (4,16,23,23),
  (8,8,24,24),
  (16,4,24,24),
  (32,2,62,59)
) t(bands, rows_per_band, n_candidate_edges, n_dup_docs)