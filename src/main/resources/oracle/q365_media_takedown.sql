SELECT CAST(artifact AS VARCHAR) AS artifact, CAST(n_before AS BIGINT) AS n_before, CAST(n_deleted AS BIGINT) AS n_deleted, CAST(n_after AS BIGINT) AS n_after, CAST(n_residue AS BIGINT) AS n_residue, CAST(matches_rebuild AS INTEGER) AS matches_rebuild
FROM (VALUES
  ('media_clusters',97,1,96,0,1),
  ('media_keyed',500,44,456,0,1),
  ('media_sigs',97,1,96,0,1)
) t(artifact, n_before, n_deleted, n_after, n_residue, matches_rebuild)