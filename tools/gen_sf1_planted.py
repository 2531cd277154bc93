#!/usr/bin/env python3
"""Plant known CROSS-SHARD near-duplicates over the sf1 corpus.

gen_sf1.py builds sf1 as 10 Caesar-rotated shards, which makes
cross-shard near-dups impossible BY CONSTRUCTION — so the 10x gate
can never exercise duplicates that straddle corpus growth (the shape a
real 10x crawl has). This tool closes that regime without touching the
pristine sf1 tables (every existing sf1 result stays valid):

 - picks one base document per shard 1..9 (deterministic: the smallest
   doc_id whose normalized text is >= 200 chars and has no exact twin
   anywhere in the corpus) and plants, under NEW ids >= 1,000,000
   (a pseudo-shard 10 the real shards never touch):
     * an EXACT copy   (5-gram Jaccard 1.0  — the banding MUST pair it)
     * a TRUNCATED copy (prefix cut, exact Jaccard computed here and
       asserted >= 0.6 — above d2/d16's 0.5 threshold with margin)
   Planted doc ids are chosen so the t8/d16 md5 split assigns them all
   to DELTA, making every planted pair visible to d16's delta-vs-index
   verdict regardless of where the base lands.
 - plants one CONTAINMENT pair per shard 1..9: a SMALL twin-free doc
   quoted WHOLE at the end of a same-source filler page >= 5x its
   normalized length (concatenation preserves the small doc's token
   sequence contiguously, so every word-3-gram of the small doc occurs
   in the super page -> forward containment EXACTLY 1.0) while the
   symmetric word-gram Jaccard stays BELOW d4's 0.4 threshold
   (asserted here) — the directional-vs-symmetric contrast d17 exists
   for, now pinned at the corpus-growth boundary.
 - picks one base embedding per shard 1..9 (smallest vec_id with
   vec_id % 100 != 0 — never a probe — and nonzero norm) and plants a
   2.0x-scaled copy: scaling by a power of two is EXACT in IEEE floats,
   so the hyperplane sign pattern (hence every LSH band key) and the
   cosine (exactly 1.0) are bit-identical — d9 MUST pair it. The copy
   INHERITS the base's label so the label-blocked pair generators
   (d5's shape, g4's edge step) see the planted edge too.

Outputs (never modifies testdata-sf1's own tables):
  testdata-sf1/planted/documents_planted.parquet
  testdata-sf1/planted/embeddings_planted.parquet
  testdata-sf1/planted/manifest.json
  testdata-sf1-planted/   — a merged VIEW: symlinks to every pristine
    table, except documents.parquet / embeddings.parquet which become
    directories holding (pristine, planted) file pairs; Spark reads the
    directory transparently, so Verify runs against it unchanged.

Check with tools/check_sf1_planted.py after running Verify:
  SPARK_GRAFT_QUERIES=d2_minhash_lsh,d4_ngram_jaccard,d9_embed_lsh_auto,\
d16_neardup_incremental,d17_containment,s10_knn_graph,g4_cc_incremental \
    sbt "runMain graft.Verify <repo>/testdata-sf1-planted /tmp/sf1p_out"
"""
import hashlib
import json
import math
import os
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "testdata-sf1")
PLANTED = os.path.join(SF1, "planted")
VIEW = os.path.join(REPO, "testdata-sf1-planted")
SHARD = 100000
PLANT_BASE = 1000000

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm(text):
    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()


def shingles(text, k=5):
    n = norm(text)
    if len(n) < k:
        return set()
    return {n[i:i + k] for i in range(len(n) - k + 1)}


def jaccard(a, b):
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def split_of(doc_id, salt="graft"):
    # the t8/d16 deterministic split: md5 hex prefix < 'b333' -> index
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:4]
    return "index" if h < "b333" else "delta"


def _norm_sql(c):
    return (f"trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
            " ' +', ' ', 'g'))")


def main():
    os.makedirs(PLANTED, exist_ok=True)
    con = duckdb.connect()

    # ---- base documents: one per shard 1..9, long + twin-free --------
    bases = con.sql(f"""
        WITH n AS (
          SELECT doc_id, text, lang, source,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')) AS nt
          FROM '{SF1}/documents.parquet'),
        fp AS (SELECT md5(nt) AS f, count(*) AS c FROM n GROUP BY 1)
        SELECT doc_id, text, lang, source
        FROM n JOIN fp ON md5(n.nt) = fp.f
        WHERE length(nt) >= 200 AND fp.c = 1
          AND doc_id // {SHARD} BETWEEN 1 AND 9
        -- shard s contributes its s-th qualifying doc, so the 9 bases
        -- are rotations of 9 DIFFERENT underlying documents (rank 1
        -- everywhere would select 9 rotations of the same sf0.1 doc)
        QUALIFY row_number() OVER (PARTITION BY doc_id // {SHARD}
                                   ORDER BY doc_id) = doc_id // {SHARD}
        ORDER BY doc_id""").fetchall()
    assert len(bases) == 9, f"expected 9 base docs, got {len(bases)}"

    # ---- planted ids: all DELTA under the d16 split -------------------
    delta_ids = [i for i in range(PLANT_BASE, PLANT_BASE + 2000)
                 if split_of(i) == "delta"]
    exact_ids, trunc_ids = delta_ids[:9], delta_ids[9:18]

    doc_rows, doc_pairs = [], []
    for (bid, text, lang, source), pe, pt in zip(bases, exact_ids, trunc_ids):
        doc_rows.append((pe, text, lang, source, len(text)))
        doc_pairs.append({"base": bid, "planted": pe, "kind": "exact",
                          "jaccard": 1.0})
        base_sh = shingles(text)
        cut_text, j = None, 0.0
        for frac in (0.85, 0.90, 0.95):
            cand = text[:math.ceil(frac * len(text))]
            j = jaccard(base_sh, shingles(cand))
            if j >= 0.6:
                cut_text = cand
                break
        assert cut_text is not None, \
            f"no truncation of doc {bid} reaches jaccard 0.6 (last j={j})"
        doc_rows.append((pt, cut_text, lang, source, len(cut_text)))
        doc_pairs.append({"base": bid, "planted": pt, "kind": "truncated",
                          "jaccard": round(j, 4)})

    # ---- containment plants: small doc quoted whole in a big page -----
    # per shard: small = twin-free doc with 44 <= norm length <= 110
    # (the corpus caps at 577 norm chars, so 5x fillers exist only for
    # smalls <= ~115); filler = same-shard same-source doc with norm
    # length >= 5x the small's (so symmetric word-gram jaccard stays
    # < d4's 0.4 while forward containment is exactly 1.0 by
    # construction)
    smalls = con.sql(f"""
        WITH n AS (
          SELECT doc_id, text, lang, source,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')) AS nt
          FROM '{SF1}/documents.parquet'),
        fp AS (SELECT md5(nt) AS f, count(*) AS c FROM n GROUP BY 1)
        SELECT doc_id, text, lang, source, length(nt) AS ln
        FROM n JOIN fp ON md5(n.nt) = fp.f
        WHERE length(nt) BETWEEN 44 AND 110 AND fp.c = 1
          AND doc_id // {SHARD} BETWEEN 1 AND 9
        -- s-th qualifying doc per shard: 9 DIFFERENT underlying docs
        -- (rank 1 everywhere = 9 rotations of one sf0.1 doc)
        QUALIFY row_number() OVER (PARTITION BY doc_id // {SHARD}
                                   ORDER BY doc_id) = doc_id // {SHARD}
        ORDER BY doc_id""").fetchall()
    assert len(smalls) == 9, f"expected 9 small docs, got {len(smalls)}"
    cont_ids = delta_ids[18:27]
    cont_pairs = []

    def toks(t):
        return norm(t).split()

    def wgrams(t, n=3):
        tk = toks(t)
        return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

    for (sid, stext, lang, source, sln), pid in zip(smalls, cont_ids):
        filler = con.sql(f"""
            SELECT text FROM (
              SELECT doc_id, text,
                length(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS ln
              FROM '{SF1}/documents.parquet'
              WHERE doc_id // {SHARD} = {sid // SHARD}
                AND source = ? AND doc_id != {sid})
            WHERE ln >= 5 * {sln} ORDER BY doc_id LIMIT 1""",
            params=[source]).fetchall()
        assert filler, f"no same-source filler >= 5x for small doc {sid}"
        super_text = filler[0][0] + " " + stext
        gs, gp = wgrams(stext), wgrams(super_text)
        assert gs and gs <= gp, f"containment != 1.0 for planted pair ({sid},{pid})"
        sym_j = len(gs & gp) / len(gs | gp)
        assert sym_j < 0.4, \
            f"symmetric jaccard {sym_j:.3f} >= 0.4 for ({sid},{pid}) — " \
            "filler too small; d4-blindness contrast lost"
        doc_rows.append((pid, super_text, lang, source, len(super_text)))
        cont_pairs.append({"sub": sid, "sup": pid, "sym_jaccard": round(sym_j, 4)})

    # ---- d19 plants: offset-shifted copied paragraph ------------------
    # per shard 1..9: a ~150-norm-char paragraph lifted from the MIDDLE
    # of a long base doc, re-planted behind a filler prefix from a
    # DIFFERENT same-shard doc. The generator PROVES d10-blindness
    # empirically: the planted doc's fixed-20-token chunk hashes match
    # NOTHING in the corpus (nor repeat within the doc), so
    # d10_chunk_dedup must report zero dup chunks for it — while the
    # paragraph's winnow anchors are content-defined and d19 must
    # recover a dup span covering most of it (asserted by
    # check_sf1_planted.py from the Verify output).
    def chunk_hashes(text):
        tk = norm(text).split()
        return [hashlib.md5(" ".join(tk[i:i + 20]).encode()).hexdigest()
                for i in range(0, len(tk), 20)]

    corpus_hashes = set(h[0] for h in con.sql(f"""
        WITH t AS (SELECT CASE WHEN trim({_norm_sql('text')}) = ''
                     THEN CAST([] AS VARCHAR[])
                     ELSE regexp_split_to_array(trim({_norm_sql('text')}), ' +')
                     END AS tk
                   FROM '{SF1}/documents.parquet')
        SELECT DISTINCT md5(array_to_string(list_slice(tk, i * 20 + 1, i * 20 + 20), ' '))
        FROM t, LATERAL (SELECT unnest(range(0, CAST(ceil(len(tk) / 20.0) AS BIGINT))) AS i)
        WHERE len(tk) > 0""").fetchall())
    for r in doc_rows:
        corpus_hashes.update(chunk_hashes(r[1]))

    d19_bases = con.sql(f"""
        WITH n AS (
          SELECT doc_id, text, lang, source,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')) AS nt
          FROM '{SF1}/documents.parquet'),
        fp AS (SELECT md5(nt) AS f, count(*) AS c FROM n GROUP BY 1)
        SELECT doc_id, text, lang, source
        FROM n JOIN fp ON md5(n.nt) = fp.f
        WHERE length(nt) >= 450 AND fp.c = 1
          AND doc_id // {SHARD} BETWEEN 1 AND 9
        QUALIFY row_number() OVER (PARTITION BY doc_id // {SHARD}
                                   ORDER BY doc_id DESC) = doc_id // {SHARD}
        ORDER BY doc_id""").fetchall()
    assert len(d19_bases) == 9, f"expected 9 d19 base docs, got {len(d19_bases)}"
    d19_ids = delta_ids[27:36]
    sub_pairs = []
    for (bid, btext, lang, source), pid in zip(d19_bases, d19_ids):
        raw = btext.split()
        # paragraph: raw tokens from the middle of the base until the
        # normalized slice reaches 150 chars
        a = len(raw) // 3
        m = 1
        while m < len(raw) - a and len(norm(" ".join(raw[a:a + m]))) < 150:
            m += 1
        para = " ".join(raw[a:a + m])
        para_norm_len = len(norm(para))
        assert para_norm_len >= 150, f"base {bid} too short for a paragraph"
        fill_rows = con.sql(f"""
            SELECT text FROM '{SF1}/documents.parquet'
            WHERE doc_id // {SHARD} = {bid // SHARD} AND doc_id != {bid}
              AND length(text) >= 400
            ORDER BY doc_id LIMIT 1""").fetchall()
        assert fill_rows, f"no filler doc for d19 base {bid}"
        fraw = fill_rows[0][0].split()
        planted_text = None
        for j in range(5, min(40, len(fraw) - 4)):
            cand = " ".join(fraw[3:3 + j]) + " " + para
            hs = chunk_hashes(cand)
            if len(hs) == len(set(hs)) and not (set(hs) & corpus_hashes):
                planted_text = cand
                break
        assert planted_text is not None, \
            f"no filler length keeps d19 plant for base {bid} chunk-clean"
        corpus_hashes.update(chunk_hashes(planted_text))
        doc_rows.append((pid, planted_text, lang, source, len(planted_text)))
        sub_pairs.append({"base": bid, "planted": pid,
                          "para_norm_len": para_norm_len})

    doc_tbl = pa.table({
        "doc_id": pa.array([r[0] for r in doc_rows], pa.int64()),
        "text": pa.array([r[1] for r in doc_rows], pa.string()),
        "lang": pa.array([r[2] for r in doc_rows], pa.string()),
        "source": pa.array([r[3] for r in doc_rows], pa.string()),
        "n_chars": pa.array([r[4] for r in doc_rows], pa.int64()),
    })
    pq.write_table(doc_tbl, f"{PLANTED}/documents_planted.parquet")

    # ---- base embeddings: one per shard 1..9, non-probe, nonzero ------
    ebases = con.sql(f"""
        SELECT vec_id, embedding, label
        FROM '{SF1}/embeddings.parquet'
        WHERE vec_id % 100 != 0 AND vec_id // {SHARD} BETWEEN 1 AND 9
          AND list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[])) > 0
        -- s-th qualifying vector per shard: 9 distinct underlying
        -- vectors, same reasoning as the document bases
        QUALIFY row_number() OVER (PARTITION BY vec_id // {SHARD}
                                   ORDER BY vec_id) = vec_id // {SHARD}
        ORDER BY vec_id""").fetchall()
    assert len(ebases) == 9, f"expected 9 base vectors, got {len(ebases)}"

    emb_rows, emb_pairs = [], []
    for k, (vid, emb, lbl) in enumerate(ebases, start=1):
        pid = PLANT_BASE + k            # 1000001..1000009: never % 100 == 0
        assert pid % 100 != 0
        # label inherited from the base: the label-blocked pair
        # generators (d5 shape, g4's edge step) must SEE the planted
        # edge; the label-less ones (d9, s10) find it regardless
        emb_rows.append((pid, [2.0 * x for x in emb], lbl))
        emb_pairs.append({"base": vid, "planted": pid, "cosine": 1.0,
                          "label": int(lbl)})

    # ---- d18 plants: train-side vector, eval-side 2.0x copy -----------
    # d18's sided decontamination (eval = vec_id % 10 == 0) needs a
    # contamination pair CROSSING the side boundary: a 2.0x copy keeps
    # the hyperplane sign pattern bit-identical (power-of-two scaling is
    # exact in IEEE floats) and cosine exactly 1.0, so planting it under
    # an id ≡ 0 (mod 10) — but never ≡ 0 (mod 100), the s-family probe
    # set — forces d18 to verdict the TRAIN base contaminated at 1.0.
    d18_bases = con.sql(f"""
        SELECT vec_id, embedding, label
        FROM '{SF1}/embeddings.parquet'
        WHERE vec_id % 10 != 0 AND vec_id // {SHARD} BETWEEN 1 AND 9
          AND list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[])) > 0
        QUALIFY row_number() OVER (PARTITION BY vec_id // {SHARD}
                                   ORDER BY vec_id DESC) = vec_id // {SHARD}
        ORDER BY vec_id""").fetchall()
    assert len(d18_bases) == 9, f"expected 9 d18 base vectors, got {len(d18_bases)}"
    d18_pairs = []
    for k, (vid, emb, lbl) in enumerate(d18_bases):
        pid = PLANT_BASE + 10 + 20 * k      # 1000010, 1000030, ... 1000170
        assert pid % 10 == 0 and pid % 100 != 0
        emb_rows.append((pid, [2.0 * x for x in emb], lbl))
        d18_pairs.append({"train": vid, "eval_copy": pid, "cosine": 1.0})

    emb_tbl = pa.table({
        "vec_id": pa.array([r[0] for r in emb_rows], pa.int64()),
        "embedding": pa.array([r[1] for r in emb_rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in emb_rows], pa.int32()),
    })
    pq.write_table(emb_tbl, f"{PLANTED}/embeddings_planted.parquet")

    manifest = {"doc_pairs": doc_pairs, "emb_pairs": emb_pairs,
                "cont_pairs": cont_pairs, "sub_pairs": sub_pairs,
                "d18_pairs": d18_pairs,
                "plant_base": PLANT_BASE, "shard": SHARD}
    with open(f"{PLANTED}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)

    # ---- merged view directory ----------------------------------------
    if os.path.isdir(VIEW):
        for root, dirs, files in os.walk(VIEW, topdown=False):
            for x in files:
                os.unlink(os.path.join(root, x))
            for d in dirs:
                os.rmdir(os.path.join(root, d))
    os.makedirs(VIEW, exist_ok=True)
    for t in TABLES:
        src = f"{SF1}/{t}.parquet"
        if t in ("documents", "embeddings"):
            d = f"{VIEW}/{t}.parquet"
            os.makedirs(d, exist_ok=True)
            os.symlink(src, f"{d}/part-00000.parquet")
            os.symlink(f"{PLANTED}/{t}_planted.parquet",
                       f"{d}/part-00001.parquet")
        else:
            os.symlink(src, f"{VIEW}/{t}.parquet")
    os.symlink(f"{PLANTED}/manifest.json", f"{VIEW}/manifest.json")

    print(f"planted {len(doc_rows)} docs ({len(doc_pairs)} near-dup + "
          f"{len(cont_pairs)} containment pairs), "
          f"{len(emb_rows)} vectors ({len(emb_pairs)} pairs)")
    for p in doc_pairs:
        print(f"  doc  base={p['base']} planted={p['planted']} "
              f"{p['kind']} j={p['jaccard']}")
    for p in cont_pairs:
        print(f"  cont sub={p['sub']} sup={p['sup']} "
              f"sym_j={p['sym_jaccard']} (containment 1.0)")
    for p in emb_pairs:
        print(f"  vec  base={p['base']} planted={p['planted']} cos=1.0 "
              f"label={p['label']}")
    for p in sub_pairs:
        print(f"  sub  base={p['base']} planted={p['planted']} "
              f"para_norm_len={p['para_norm_len']} (d10 chunk-clean, asserted)")
    for p in d18_pairs:
        print(f"  d18  train={p['train']} eval_copy={p['eval_copy']} cos=1.0")
    print(f"view: {VIEW}")


if __name__ == "__main__":
    sys.exit(main())
