SELECT CAST(err_bin AS BIGINT) AS err_bin, CAST(n_pairs AS BIGINT) AS n_pairs, CAST(avg_true_pm AS BIGINT) AS avg_true_pm, CAST(avg_est_pm AS BIGINT) AS avg_est_pm
FROM (VALUES
  (0,26,966,964),
  (1,1,655,750)
) t(err_bin, n_pairs, avg_true_pm, avg_est_pm)