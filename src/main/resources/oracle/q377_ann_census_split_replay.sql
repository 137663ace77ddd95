SELECT CAST(metric AS VARCHAR) AS metric, CAST(unsplit AS BIGINT) AS unsplit, CAST(split AS BIGINT) AS split
FROM (VALUES
  ('fat_cells',1,0),
  ('n_cells',16,40),
  ('n_code_rows',16000,16000),
  ('recall@1',750,1000),
  ('recall@2',700,1000),
  ('recall@3',666,900),
  ('recall@4',612,837),
  ('recall@5',580,800)
) t(metric, unsplit, split)