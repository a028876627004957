"""Fast end-to-end smoke of the engine's public surfaces (~2 min).

Drives: session bootstrap -> SQL kernel registry -> __spark_entry__
flagship + sample queries at sf0.001 -> the cell-id null-exactness and
st_touches SQL behaviors.  Run from anywhere:

    python /root/repo/scripts/verify_smoke.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from s2geography_spark.session import get_spark  # noqa: E402

spark = get_spark("verify", cpus=4, shuffle_partitions=8)

# 1. flagship entry (the driver's smoke surface)
import __spark_entry__ as E  # noqa: E402

df = E.entry(spark)
print("entry rows:", df.count(), "schema:", [f.name for f in df.schema.fields][:6])

# 2. SQL surface: cell-id kernels stay exact with a NULL in the batch
from s2geography_spark.functions.geo import register_sql_functions  # noqa: E402
from s2geography_spark.core import cellid as C  # noqa: E402

register_sql_functions(spark)
leaf = int(C.from_lnglat(np.array([2.3488]), np.array([48.8534]))[0])
signed = np.uint64(leaf).astype(np.int64).item()
spark.createDataFrame([(signed,), (None,)], "id long").coalesce(1) \
    .createOrReplaceTempView("ids")
rows = spark.sql("SELECT s2_cell_area(CAST(id AS STRING)) a, "
                 "s2_celltodebugstring(CAST(id AS STRING)) d FROM ids").collect()
print("cell SQL with null:", [(r.a, None if r.d is None else r.d[:14]) for r in rows])
exp = float(C.cell_area(np.array([leaf], dtype=np.uint64))[0])
print("exact area match:", any(r.a is not None and r.a == exp for r in rows))
try:
    spark.sql("SELECT s2_cell_area(id) FROM ids").collect()
    print("lossy nullable-bigint path: NO ERROR (BAD)")
except Exception as e:  # noqa: BLE001
    print("lossy nullable-bigint path raises:",
          "float64" in str(e) or "STRING" in str(e))

# 3. st_touches: line straight through polygon must be False both orders
r = spark.sql("""
  SELECT st_touches(st_geogfromtext('LINESTRING (-0.5 0.5, 1.5 0.5)'),
                    st_geogfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) t1,
         st_touches(st_geogfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
                    st_geogfromtext('LINESTRING (-0.5 0.5, 1.5 0.5)')) t2
""").collect()[0]
print("touches(line-through-poly):", r.t1, r.t2, "(want False False)")

# 4. round-2 surfaces: general overlay + buffer params + ZM via SQL
r = spark.sql("""
  SELECT st_astext(st_union(st_geogfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
                            st_geogfromtext('POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))'))) AS u,
         st_astext(st_buffer_params(st_geogfromtext('LINESTRING (0 0, 1 0)'),
                                    100000.0, 'endcap=flat')) AS bf,
         st_astext(st_lineinterpolatepoint(st_geogfromtext(
           'LINESTRING ZM (0 0 10 20, 0 2 12 22)'), 0.5)) AS zm
""").collect()[0]
print("adjacent union merged:", r.u.startswith("POLYGON ((") and "2 0" in r.u)
print("flat buffer quad:", r.bf.count(",") == 4)
print("zm interpolate:", r.zm)

# 5. sample driver queries at sf0.001 (the correctness-gate surface)
qs = E.queries()
for name in ["geo_pip_pairs", "geo_knn", "geo_overlay_adjacent", "dedup_exact"]:
    out = qs[name](spark, "/root/testdata/sf0.001")
    print(name, "->", out.count(), "rows")
spark.stop()
print("SMOKE OK")
