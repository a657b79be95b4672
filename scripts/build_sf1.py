"""Build /tmp/sf1: 10x replication of /root/testdata/sf0.1 with key
remapping (replica r shifts each surrogate key by r * ceil_max) and a
per-replica character rotation of document text so replicas are not
trivial near-duplicates of each other. Scaling spot-check input only —
correctness oracles keep using the driver-generated testdata."""
import duckdb, os, shutil

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
R = 10
shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)
con = duckdb.connect()
con.execute(f"SET threads TO 16")

def src(t):
    return f"'{SRC}/{t}.parquet'"

# key strides (power-of-10 ceilings keep arithmetic readable)
K = {"cust": 100000, "supp": 10000, "part": 100000, "ord": 1000000,
     "evt": 1000000, "user": 100000, "doc": 100000, "vec": 100000}

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

reps = f"(SELECT range AS r FROM range({R}))"

con.execute(f"""COPY (
  SELECT c_custkey + r * {K['cust']} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')}, {reps}
) TO '{DST}/customer.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT s_suppkey + r * {K['supp']} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}, {reps}
) TO '{DST}/supplier.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT p_partkey + r * {K['part']} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')}, {reps}
) TO '{DST}/part.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT o_orderkey + r * {K['ord']} AS o_orderkey,
         o_custkey + r * {K['cust']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {reps}
) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT l_orderkey + r * {K['ord']} AS l_orderkey,
         l_partkey + r * {K['part']} AS l_partkey,
         l_suppkey + r * {K['supp']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {reps}
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT event_id + r * {K['evt']} AS event_id, ts,
         user_id + r * {K['user']} AS user_id, event_type, value, props
  FROM {src('events')}, {reps}
) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

# rotate text at a replica-dependent character offset: replicas keep the
# length/vocab distribution but share few shingles with each other
con.execute(f"""COPY (
  SELECT doc_id + r * {K['doc']} AS doc_id,
         CASE WHEN r = 0 OR length(text) < 8 THEN text
              ELSE substr(text, 1 + ((r * 37) % greatest(length(text) - 1, 1)))
                   || ' ' ||
                   substr(text, 1, (r * 37) % greatest(length(text) - 1, 1))
         END AS text,
         lang, source, n_chars
  FROM {src('documents')}, {reps}
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT vec_id + r * {K['vec']} AS vec_id, embedding, label
  FROM {src('embeddings')}, {reps}
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")

for t in ("customer","orders","lineitem","events","documents","embeddings"):
    print(t, con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0])
print("built", DST)
