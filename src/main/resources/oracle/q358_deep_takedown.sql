SELECT CAST(artifact AS VARCHAR) AS artifact, CAST(n_requested AS BIGINT) AS n_requested, CAST(n_expanded AS BIGINT) AS n_expanded, CAST(n_residue AS BIGINT) AS n_residue, CAST(matches_rebuild AS INTEGER) AS matches_rebuild
FROM (VALUES
  ('ann',19,21,0,1),
  ('curated',18,23,0,1)
) t(artifact, n_requested, n_expanded, n_residue, matches_rebuild)