SELECT CAST(lang AS VARCHAR) AS lang, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(fingerprint AS BIGINT) AS fingerprint, CAST(matches_rebuild AS INTEGER) AS matches_rebuild
FROM (VALUES
  ('de',60,3233,603632226034,1),
  ('en',165,9699,314966578550,1),
  ('es',61,3550,45549987715,1),
  ('fr',47,3086,639623517496,1),
  ('zh',69,4012,399140034253,1)
) t(lang, n_docs, n_tokens, fingerprint, matches_rebuild)