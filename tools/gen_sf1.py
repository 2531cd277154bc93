#!/usr/bin/env python3
"""Generate the sf1 (10x sf0.1) proof-point dataset under testdata-sf1/.

sf1 is TEN STRUCTURE-PRESERVING SHARDS of sf0.1, so per-row cost can be
measured across a 10x step while every oracle stays computable:

 - ids are offset by a per-shard stride (strides exceed every sf0.1 max,
   so shards never collide; the embedding stride is a multiple of 100 so
   the `vec_id % 100 = 0` probe predicate selects each shard's probes);
 - document text is rotated by a per-shard Caesar cipher (a bijection on
   letters: every within-shard equality/similarity relation — shingle
   sets, token multisets, duplicate clusters — is preserved EXACTLY,
   while cross-shard near-duplicate pairs become impossible, keeping the
   near-dup structure linear in corpus size instead of quadratic);
 - embeddings are cyclically dim-shifted per shard (within-shard dot
   products and norms are bit-identical; cross-shard cosines decorrelate)
   and labels are offset per shard (d5/d7's blocking keys stay
   shard-local, so their oracles stay 10x sf0.1's cost, not 100x);
 - the fixed dims (region, nation) are shared, as a real 10x would be.

Timestamp units mirror the source files exactly (events ns; orders /
lineitem ms) so Spark's readers see identical physical types.
"""
import os
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata-sf1")
N = 10
AZ = "abcdefghijklmnopqrstuvwxyz"

def rot_expr(col, ci):
    # letters AND digits rotate: a letter-only cipher would leave
    # digit/space-only documents byte-identical across shards, creating
    # true cross-shard duplicates that break the "shards are textually
    # disjoint" construction the d2 checks rely on
    if ci == 0:
        return col
    lo, hi, dg = AZ, AZ.upper(), "0123456789"
    rlo, rhi = lo[ci:] + lo[:ci], hi[ci:] + hi[:ci]
    rdg = dg[ci % 10:] + dg[:ci % 10]
    return f"translate({col}, '{lo}{hi}{dg}', '{rlo}{rhi}{rdg}')"

def shift_expr(col, ci, dim=64):
    k = (ci * 7) % dim
    if k == 0:
        return col
    # 1-based inclusive list slices: [k+1..dim] ++ [1..k]
    return f"({col}[{k + 1}:{dim}] || {col}[1:{k}])"

def case_over_copies(fn, col):
    branches = "".join(
        f" WHEN ci = {ci} THEN {fn(col, ci)}" for ci in range(N))
    return f"CASE{branches} END"

def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({N})) AS ci")

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    specs = {
        "customer": ("c_custkey + ci*100000 AS c_custkey, c_name, c_nationkey,"
                     " c_acctbal, c_mktsegment", None),
        "supplier": ("s_suppkey + ci*10000 AS s_suppkey, s_name, s_nationkey,"
                     " s_acctbal", None),
        "part": ("p_partkey + ci*100000 AS p_partkey, p_name, p_brand, p_type,"
                 " p_size, p_retailprice", None),
        "orders": ("o_orderkey + ci*1000000 AS o_orderkey,"
                   " o_custkey + ci*100000 AS o_custkey, o_orderstatus,"
                   " o_totalprice, o_orderdate, o_orderpriority",
                   {"o_orderdate": pa.timestamp("ms")}),
        "lineitem": ("l_orderkey + ci*1000000 AS l_orderkey,"
                     " l_partkey + ci*100000 AS l_partkey,"
                     " l_suppkey + ci*10000 AS l_suppkey, l_linenumber,"
                     " l_quantity, l_extendedprice, l_discount, l_tax,"
                     " l_returnflag, l_linestatus, l_shipdate",
                     {"l_shipdate": pa.timestamp("ms")}),
        "events": ("event_id + ci*1000000 AS event_id, ts,"
                   " user_id + ci*10000 AS user_id, event_type, value, props",
                   {"ts": pa.timestamp("ns")}),
        "documents": (f"doc_id + ci*100000 AS doc_id,"
                      f" {case_over_copies(rot_expr, 'text')} AS text,"
                      f" lang, source, n_chars", None),
        "embeddings": (f"vec_id + ci*100000 AS vec_id,"
                       f" CAST({case_over_copies(shift_expr, 'embedding')}"
                       f" AS FLOAT[]) AS embedding,"
                       f" CAST(label + ci*100 AS INTEGER) AS label", None),
    }
    for t, (proj, casts) in specs.items():
        tbl = con.sql(
            f"SELECT {proj} FROM '{SRC}/{t}.parquet' CROSS JOIN copies"
        ).arrow().combine_chunks()
        if casts:
            fields = [pa.field(f.name, casts.get(f.name, f.type))
                      for f in tbl.schema]
            tbl = tbl.cast(pa.schema(fields))
        pq.write_table(tbl, f"{DST}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows")

    # sanity: counts are 10x, shards never collide, shard 0 is verbatim
    for t, key in [("lineitem", "l_orderkey"), ("events", "event_id"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")]:
        n0 = con.sql(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n1, d1 = con.sql(f"SELECT count(*), count(DISTINCT {key}) "
                         f"FROM '{DST}/{t}.parquet'").fetchone()
        assert n1 == N * n0, (t, n0, n1)
        if t != "lineitem":
            assert d1 == n1, (t, "key collision across shards")
    same = con.sql(
        f"SELECT count(*) FROM '{SRC}/documents.parquet' s "
        f"JOIN '{DST}/documents.parquet' d USING (doc_id) "
        f"WHERE s.text = d.text AND s.n_chars = d.n_chars").fetchone()[0]
    assert same == con.sql(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    print("sanity OK")

if __name__ == "__main__":
    sys.exit(main())
