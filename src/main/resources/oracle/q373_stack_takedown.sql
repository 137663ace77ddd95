SELECT CAST(query_id AS VARCHAR) AS query_id, CAST(rnk AS INTEGER) AS rnk, CAST(doc_id AS BIGINT) AS doc_id, CAST(rank_bm25 AS INTEGER) AS rank_bm25, CAST(rank_ann AS INTEGER) AS rank_ann, CAST(rrf_micro AS BIGINT) AS rrf_micro, CAST(n_residue AS BIGINT) AS n_residue, CAST(matches_rebuild AS INTEGER) AS matches_rebuild
FROM (VALUES
  ('q1',1,134,3,4,31498,0,1),
  ('q1',2,457,9,2,30621,0,1),
  ('q1',3,45,6,5,30535,0,1),
  ('q1',4,120,10,3,30158,0,1),
  ('q1',5,236,1,NULL,16393,0,1),
  ('q2',1,274,7,1,31318,0,1),
  ('q2',2,252,5,5,30768,0,1),
  ('q2',3,359,3,8,30578,0,1),
  ('q2',4,278,9,3,30365,0,1),
  ('q2',5,303,8,4,30330,0,1),
  ('q3',1,160,6,1,31544,0,1),
  ('q3',2,401,2,5,31513,0,1),
  ('q3',3,424,5,3,31257,0,1),
  ('q3',4,235,8,2,30834,0,1),
  ('q3',5,331,4,6,30776,0,1)
) t(query_id, rnk, doc_id, rank_bm25, rank_ann, rrf_micro, n_residue, matches_rebuild)