SELECT CAST(metric AS VARCHAR) AS metric, CAST(unsplit AS BIGINT) AS unsplit, CAST(split AS BIGINT) AS split
FROM (VALUES
  ('adc_candidates',30467,7664),
  ('fat_cells',1,0),
  ('n_cells',16,44),
  ('n_code_rows',16000,16000),
  ('recall@1',750,1000),
  ('recall@2',700,1000),
  ('recall@3',666,883),
  ('recall@4',612,812),
  ('recall@5',580,770)
) t(metric, unsplit, split)