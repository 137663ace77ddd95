SELECT CAST(cell AS INTEGER) AS cell, CAST(sub AS VARCHAR) AS sub, CAST(n_members AS BIGINT) AS n_members, CAST(n_parent AS BIGINT) AS n_parent, CAST(member_hash AS BIGINT) AS member_hash
FROM (VALUES
  (0,'',34,34,9591),
  (1,'',33,33,7965),
  (2,'',29,29,6556),
  (3,'',38,38,9967),
  (4,'',37,37,9846),
  (5,'',33,33,8105),
  (6,'',36,36,8452),
  (7,'a',59,117,47839470),
  (7,'b',58,117,49790766),
  (8,'',35,35,8698),
  (9,'',21,21,5342),
  (10,'',34,34,8495),
  (11,'',29,29,6620),
  (12,'',30,30,7774),
  (13,'',37,37,9475),
  (14,'',26,26,5608),
  (15,'',31,31,7370)
) t(cell, sub, n_members, n_parent, member_hash)