SELECT CAST(artifact AS VARCHAR) AS artifact, CAST(n_before AS BIGINT) AS n_before, CAST(n_deleted AS BIGINT) AS n_deleted, CAST(n_after AS BIGINT) AS n_after, CAST(n_residue AS BIGINT) AS n_residue, CAST(matches_rebuild AS INTEGER) AS matches_rebuild
FROM (VALUES
  ('ann_codes',4000,368,3632,0,1),
  ('ann_serve',100,11,100,0,1),
  ('ann_vectors',500,46,454,0,1),
  ('curated_corpus',434,32,402,0,1),
  ('dedup_clusters',500,39,461,0,1)
) t(artifact, n_before, n_deleted, n_after, n_residue, matches_rebuild)