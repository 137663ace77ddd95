SELECT CAST(relevance AS VARCHAR) AS relevance, CAST(ranker AS VARCHAR) AS ranker, CAST(query_id AS VARCHAR) AS query_id, CAST(n_relevant AS BIGINT) AS n_relevant, CAST(hits_at_k AS BIGINT) AS hits_at_k, CAST(recall_bp AS BIGINT) AS recall_bp, CAST(ndcg AS DOUBLE) AS ndcg
FROM (VALUES
  ('lexical','ann','q1',20,3,1500,'0.7227265726449517'),
  ('lexical','ann','q2',263,4,152,'0.7860137352654726'),
  ('lexical','ann','q3',321,4,124,'0.8539316501572936'),
  ('lexical','bm25','q1',20,4,2000,'0.8539316501572936'),
  ('lexical','bm25','q2',263,5,190,'1.0'),
  ('lexical','bm25','q3',321,5,155,'1.0'),
  ('lexical','fused','q1',20,4,2000,'0.8539316501572936'),
  ('lexical','fused','q2',263,5,190,'1.0'),
  ('lexical','fused','q3',321,5,155,'1.0'),
  ('vector','ann','q1',20,5,2500,'1.0'),
  ('vector','ann','q2',20,5,2500,'1.0'),
  ('vector','ann','q3',20,5,2500,'1.0'),
  ('vector','bm25','q1',20,3,1500,'0.6992148198508501'),
  ('vector','bm25','q2',20,3,1500,'0.5147714448836774'),
  ('vector','bm25','q3',20,2,1000,'0.30078518014915'),
  ('vector','fused','q1',20,5,2500,'1.0'),
  ('vector','fused','q2',20,5,2500,'1.0'),
  ('vector','fused','q3',20,5,2500,'1.0')
) t(relevance, ranker, query_id, n_relevant, hits_at_k, recall_bp, ndcg)