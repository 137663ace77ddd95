SELECT CAST(query_id AS VARCHAR) AS query_id, CAST(rnk AS INTEGER) AS rnk, CAST(doc_id AS BIGINT) AS doc_id, CAST(rank_bm25 AS INTEGER) AS rank_bm25, CAST(rank_ann AS INTEGER) AS rank_ann, CAST(rrf_micro AS BIGINT) AS rrf_micro
FROM (VALUES
  ('q1',1,236,2,2,32258),
  ('q1',2,26,1,8,31098),
  ('q1',3,45,7,3,30798),
  ('q1',4,134,4,6,30776),
  ('q1',5,457,10,1,30678),
  ('q2',1,274,7,1,31318),
  ('q2',2,278,8,3,30578),
  ('q2',3,359,3,8,30578),
  ('q2',4,252,6,5,30535),
  ('q2',5,303,10,4,29910),
  ('q3',1,160,7,1,31318),
  ('q3',2,424,6,2,31280),
  ('q3',3,401,3,7,30798),
  ('q3',4,235,9,3,30365),
  ('q3',5,331,5,10,29669)
) t(query_id, rnk, doc_id, rank_bm25, rank_ann, rrf_micro)