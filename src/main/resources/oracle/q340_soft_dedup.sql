SELECT CAST(source AS VARCHAR) AS source, CAST(n_docs AS BIGINT) AS n_docs, CAST(raw_tokens AS BIGINT) AS raw_tokens, CAST(effective_milli_toks AS BIGINT) AS effective_milli_toks, CAST(discount_permille AS BIGINT) AS discount_permille
FROM (VALUES
  ('src0',25,1435,1376500,41),
  ('src1',25,1540,1464000,50),
  ('src10',25,1303,1183000,93),
  ('src11',25,1522,1500500,15),
  ('src12',25,1272,1200500,57),
  ('src13',25,1553,1424333,83),
  ('src14',25,1318,1290500,21),
  ('src15',25,1298,1261000,29),
  ('src16',25,1351,1351000,0),
  ('src17',25,1373,1333000,30),
  ('src18',25,1364,1233000,97),
  ('src19',25,1147,1147000,0),
  ('src2',25,1407,1377000,22),
  ('src3',25,1384,1331000,39),
  ('src4',25,1294,1282000,10),
  ('src5',25,1329,1158166,129),
  ('src6',25,1266,1183000,66),
  ('src7',25,1507,1357500,100),
  ('src8',25,1136,1094000,37),
  ('src9',25,1366,1352000,11)
) t(source, n_docs, raw_tokens, effective_milli_toks, discount_permille)