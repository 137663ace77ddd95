SELECT CAST(lang AS VARCHAR) AS lang, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(fingerprint AS BIGINT) AS fingerprint
FROM (VALUES
  ('de',60,3233,603632226034),
  ('en',185,10664,375996175685),
  ('es',66,3800,877338159964),
  ('fr',53,3508,419309290512),
  ('zh',70,4078,156439581622)
) t(lang, n_docs, n_tokens, fingerprint)