#!/usr/bin/env python3
"""Planted cross-shard near-dup recovery check at sf1
(d2, d4, d9, d16, d17, s10, g4 — the latter four when present).

gen_sf1_planted.py plants known exact + bounded-edit duplicates whose
pairs STRADDLE the corpus-growth boundary (pseudo-shard 10 vs shards
1..9) — the one regime the Caesar-rotation construction of sf1 cannot
exercise. This check asserts the three growth-sensitive operators
recover exactly that planted structure from the merged view:

  d2_minhash_lsh           every planted pair present with the exact
                           4dp Jaccard; PRECISION: every emitted pair
                           involving a planted id re-verified by exact
                           string-shingle Jaccard in DuckDB
  d4_ngram_jaccard         every planted near-dup pair (same-source by
                           construction) present with the exact 4dp
                           word-3-gram Jaccard; the planted CONTAINMENT
                           pairs ABSENT (sym jaccard < 0.4 — the
                           blindness d17 exists for)
  d9_embed_lsh_auto        every planted (base, 2.0x copy) pair present
                           at cosine 1.0; precision on planted ids
  d16_neardup_incremental  every planted doc (all delta by id choice)
                           verdicted against its base across the
                           index/delta boundary the md5 split draws
  d17_containment          every planted (small, quoted-in-super) pair
                           present FORWARD at containment exactly 1.0;
                           reverse direction absent
  g4_cc_incremental        every planted (base vec, 2.0x copy) edge —
                           label-inherited, so the edge step sees it —
                           lands base and copy in the SAME component
                           through the incremental path, with both
                           old- and new-split edges represented

Usage: check_sf1_planted.py <plantedViewDir> <verifyOutDir>
  <plantedViewDir>  testdata-sf1-planted (contains manifest.json)
  <verifyOutDir>    Verify output over the planted view containing
                    d2_minhash_lsh/ d9_embed_lsh_auto/
                    d16_neardup_incremental/
"""
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd

NORM = ("trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
        " ' +', ' ', 'g'))")


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    assert files, f"no result parquet under {outdir}/{name}"
    return pd.concat([pd.read_parquet(f) for f in files]).reset_index(drop=True)


def split_of(doc_id, salt="graft"):
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:4]
    return "index" if h < "b333" else "delta"


def main(viewdir, outdir):
    man = json.load(open(f"{viewdir}/manifest.json"))
    plant_base = man["plant_base"]
    docs_glob = f"{viewdir}/documents.parquet/*.parquet"
    embs_glob = f"{viewdir}/embeddings.parquet/*.parquet"
    con = duckdb.connect()

    # ---------------- d2: planted-pair recall + precision -------------
    d2 = load(outdir, "d2_minhash_lsh")
    have = {(r.id1, r.id2): r.jaccard for r in d2.itertuples()}
    missing = [(p["base"], p["planted"]) for p in man["doc_pairs"]
               if (p["base"], p["planted"]) not in have]
    assert not missing, f"d2 missed planted cross-shard pairs: {missing}"
    # reported jaccard must equal the exact string-shingle truth
    con.execute(
        "CREATE TABLE dp AS SELECT * FROM (VALUES " +
        ",".join(f"({p['base']},{p['planted']})" for p in man["doc_pairs"]) +
        ") t(id1, id2)")
    truth = con.sql(f"""
        WITH prep AS (
          SELECT doc_id,
            CASE WHEN length({NORM}) >= 5
                 THEN list_distinct(list_transform(range(1, length({NORM}) - 3),
                        i -> substr({NORM}, i, 5)))
                 ELSE CAST([] AS VARCHAR[]) END AS sh
          FROM '{docs_glob}'
          WHERE doc_id IN (SELECT id1 FROM dp UNION SELECT id2 FROM dp)),
        j AS (
          SELECT dp.id1, dp.id2,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS inter,
            CAST(len(a.sh) + len(b.sh) AS DOUBLE) AS szsum
          FROM dp JOIN prep a ON a.doc_id = dp.id1
                  JOIN prep b ON b.doc_id = dp.id2)
        SELECT id1, id2,
          floor((CASE WHEN szsum - inter = 0 THEN 0
                      ELSE inter / (szsum - inter) END) * 10000 + 0.5) / 10000 AS truth
        FROM j""").df()
    for r in truth.itertuples():
        got = have[(r.id1, r.id2)]
        assert abs(got - r.truth) < 5e-5, \
            f"d2 jaccard for planted pair ({r.id1},{r.id2}): {got} != {r.truth}"
    n_exact = sum(1 for p in man["doc_pairs"] if p["kind"] == "exact")
    print(f"d2: all {len(man['doc_pairs'])} planted pairs recovered "
          f"({n_exact} exact + {len(man['doc_pairs']) - n_exact} truncated), "
          f"jaccards exact")
    # precision: every emitted pair touching a planted id is a true pair
    touched = d2[(d2.id1 >= plant_base) | (d2.id2 >= plant_base)]
    con.execute("CREATE TABLE tp AS SELECT * FROM touched")
    bad = con.sql(f"""
        WITH prep AS (
          SELECT doc_id,
            CASE WHEN length({NORM}) >= 5
                 THEN list_distinct(list_transform(range(1, length({NORM}) - 3),
                        i -> substr({NORM}, i, 5)))
                 ELSE CAST([] AS VARCHAR[]) END AS sh
          FROM '{docs_glob}'
          WHERE doc_id IN (SELECT id1 FROM tp UNION SELECT id2 FROM tp)),
        j AS (
          SELECT tp.id1, tp.id2, tp.jaccard,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS inter,
            CAST(len(a.sh) + len(b.sh) AS DOUBLE) AS szsum
          FROM tp JOIN prep a ON a.doc_id = tp.id1
                  JOIN prep b ON b.doc_id = tp.id2)
        SELECT * FROM (
          SELECT id1, id2, jaccard,
            floor((CASE WHEN szsum - inter = 0 THEN 0
                        ELSE inter / (szsum - inter) END) * 10000 + 0.5) / 10000 AS truth
          FROM j) WHERE jaccard <> truth OR truth < 0.5""").df()
    assert bad.empty, f"d2 planted-id pairs failing exact verify:\n{bad}"
    print(f"d2: precision OK on all {len(touched)} planted-id pairs")

    # ---------------- d4 (optional): same-source word-gram recall -----
    # the planted copies inherit the base's source, so d4's blocking
    # sees every planted pair; the containment plants must stay ABSENT
    # (their symmetric jaccard < 0.4 BY construction — the d17 contrast)
    if glob.glob(f"{outdir}/d4_ngram_jaccard/*.parquet"):
        d4 = load(outdir, "d4_ngram_jaccard")
        d4have = {(r.id1, r.id2): r.jaccard for r in d4.itertuples()}
        need = {p["base"] for p in man["doc_pairs"]} | \
               {p["planted"] for p in man["doc_pairs"]}
        texts = {r[0]: r[1] for r in con.execute(
            f"SELECT doc_id, text FROM '{docs_glob}' "
            f"WHERE doc_id IN ({','.join(map(str, need))})").fetchall()}

        def wgrams(t, n=3):
            import re as _re
            nt = _re.sub(" +", " ", _re.sub("[^a-z0-9 ]", " ", t.lower())).strip()
            tk = nt.split()
            return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

        for p in man["doc_pairs"]:
            key = (p["base"], p["planted"])
            assert key in d4have, f"d4 missed planted same-source pair {key}"
            ga, gb = wgrams(texts[p["base"]]), wgrams(texts[p["planted"]])
            truth = len(ga & gb) / len(ga | gb)
            truth4 = int(truth * 10000 + 0.5) / 10000
            assert abs(d4have[key] - truth4) < 5e-5, \
                f"d4 jaccard for {key}: {d4have[key]} != exact {truth4}"
        for p in man.get("cont_pairs", []):
            for key in ((p["sub"], p["sup"]), (p["sup"], p["sub"])):
                assert key not in d4have, \
                    f"d4 emitted containment pair {key} (sym j should be < 0.4)"
        print(f"d4: all {len(man['doc_pairs'])} planted same-source pairs "
              f"recovered with exact word-gram jaccards; "
              f"{len(man.get('cont_pairs', []))} containment pairs correctly absent")

    # ---------------- d17 (optional): directed containment ------------
    if glob.glob(f"{outdir}/d17_containment/*.parquet") and man.get("cont_pairs"):
        d17 = load(outdir, "d17_containment")
        chave = {(r.id_sub, r.id_sup): r.containment for r in d17.itertuples()}
        for p in man["cont_pairs"]:
            fwd = chave.get((p["sub"], p["sup"]))
            assert fwd is not None and abs(fwd - 1.0) < 5e-5, \
                f"d17 forward containment ({p['sub']} in {p['sup']}) = {fwd}, want 1.0"
            assert (p["sup"], p["sub"]) not in chave, \
                f"d17 emitted reverse containment for ({p['sup']},{p['sub']})"
        print(f"d17: all {len(man['cont_pairs'])} planted quoted-whole pairs at "
              "containment exactly 1.0 forward, reverse absent")

    # ---------------- d9: planted-vector recall + precision -----------
    d9 = load(outdir, "d9_embed_lsh_auto")
    ehave = {(r.id1, r.id2): r.cosine for r in d9.itertuples()}
    emissing = [(p["base"], p["planted"]) for p in man["emb_pairs"]
                if (p["base"], p["planted"]) not in ehave]
    assert not emissing, f"d9 missed planted vector pairs: {emissing}"
    for p in man["emb_pairs"]:
        c = ehave[(p["base"], p["planted"])]
        assert abs(c - 1.0) < 5e-5, \
            f"d9 cosine for 2.0x copy ({p['base']},{p['planted']}) = {c}, want 1.0"
    etouched = d9[(d9.id1 >= plant_base) | (d9.id2 >= plant_base)]
    con.execute("CREATE TABLE ep AS SELECT * FROM etouched")
    ebad = con.sql(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM '{embs_glob}'
                   WHERE vec_id IN (SELECT id1 FROM ep UNION SELECT id2 FROM ep))
        SELECT * FROM (
          SELECT ep.id1, ep.id2, ep.cosine,
            round(CASE WHEN sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0
                       ELSE list_dot_product(a.v, b.v)
                            / (sqrt(list_dot_product(a.v, a.v))
                               * sqrt(list_dot_product(b.v, b.v))) END, 4) AS truth
          FROM ep JOIN e a ON a.vec_id = ep.id1
                  JOIN e b ON b.vec_id = ep.id2)
        WHERE abs(cosine - truth) > 0.0001 OR truth < 0.4""").df()
    assert ebad.empty, f"d9 planted-id pairs failing exact cosine:\n{ebad}"
    print(f"d9: all {len(man['emb_pairs'])} planted vector pairs recovered at "
          f"cosine 1.0; precision OK on all {len(etouched)} planted-id pairs")

    # ---------------- s10 (optional): planted rank recovery -----------
    # a 2.0x copy has cosine exactly 1.0 with its base AND identical
    # band keys, so each must appear among the other's top-k at 1.0 —
    # a targeted recall check on the k-NN graph at the growth boundary
    if glob.glob(f"{outdir}/s10_knn_graph/*.parquet"):
        g = load(outdir, "s10_knn_graph")
        edges = {(r.id, r.neighbor_id): r.cosine for r in g.itertuples()}
        for p in man["emb_pairs"]:
            for a, b in ((p["base"], p["planted"]), (p["planted"], p["base"])):
                c = edges.get((a, b))
                assert c is not None and abs(c - 1.0) < 5e-5, \
                    f"s10: planted neighbor {b} missing from {a}'s top-k (got {c})"
        print(f"s10: all {len(man['emb_pairs'])} planted pairs present in both "
              "endpoints' top-k at cosine 1.0")

    # ---------------- d16: verdicts across the growth boundary --------
    d16 = load(outdir, "d16_neardup_incremental").set_index("doc_id")
    n_bi, n_bd = 0, 0
    for p in man["doc_pairs"]:
        pid, bid = p["planted"], p["base"]
        assert split_of(pid) == "delta", \
            f"planted id {pid} not delta — regenerate with gen_sf1_planted.py"
        row = d16.loc[pid]
        if split_of(bid) == "index":
            n_bi += 1
            assert row.verdict == "dup_index" and row.n_index_matches >= 1, \
                f"planted {pid} (base {bid} in INDEX) got {row.verdict}"
        else:
            n_bd += 1
            assert row.n_delta_matches >= 1, \
                f"planted {pid} (base {bid} in DELTA) has no delta match"
    assert n_bi >= 1 and n_bd >= 1, \
        f"split mix too degenerate to test both legs (index={n_bi}, delta={n_bd})"
    print(f"d16: all {len(man['doc_pairs'])} planted delta docs verdicted "
          f"against their base ({n_bi} across index/delta boundary, "
          f"{n_bd} within-delta)")
    # ---------------- g4 (optional): incremental-CC merge -------------
    # each planted edge (base vec, 2.0x copy at cosine 1.0, label
    # inherited) must land both endpoints in the SAME component through
    # g4's incremental path; the deterministic 70/30 split must route
    # at least one planted edge through EACH leg (base CC vs contracted
    # delta merge) for the check to exercise the incremental machinery
    if glob.glob(f"{outdir}/g4_cc_incremental/*.parquet"):
        g4 = load(outdir, "g4_cc_incremental").set_index("id")
        n_old, n_new = 0, 0
        for p in man["emb_pairs"]:
            a, b = p["base"], p["planted"]
            ca, cb = g4.loc[a].component, g4.loc[b].component
            assert ca == cb, \
                f"g4: planted edge ({a},{b}) split across components {ca}/{cb}"
            if (a * 31 + b) % 10 < 7:
                n_old += 1
            else:
                n_new += 1
        assert n_old >= 1 and n_new >= 1, \
            f"split mix degenerate (old={n_old}, new={n_new}) — the " \
            "contracted-delta leg is untested; adjust planted ids"
        print(f"g4: all {len(man['emb_pairs'])} planted edges merged into one "
              f"component each ({n_old} via base CC, {n_new} via the "
              "contracted-delta incremental merge)")

    # ---------------- d19 (optional): offset-shifted paragraph --------
    # each planted doc carries a ~150-char paragraph copied from its
    # base at a shifted offset; the generator PROVED its fixed-20-token
    # chunk hashes match nothing in the corpus, so d10 must report zero
    # dup chunks while d19's content-defined anchors recover a dup span
    # covering most of the paragraph
    if glob.glob(f"{outdir}/d19_substring_dedup/*.parquet") and man.get("sub_pairs"):
        d19 = load(outdir, "d19_substring_dedup").set_index("doc_id")
        d10p = (load(outdir, "d10_chunk_dedup").set_index("doc_id")
                if glob.glob(f"{outdir}/d10_chunk_dedup/*.parquet") else None)
        for p in man["sub_pairs"]:
            row = d19.loc[p["planted"]]
            need = p["para_norm_len"] * 2 // 5
            assert row.n_dup_anchors >= 5 and row.dup_chars >= need, \
                (f"d19: planted {p['planted']} (para from {p['base']}) has "
                 f"dup_anchors={row.n_dup_anchors} dup_chars={row.dup_chars}, "
                 f"want >= 5 / >= {need}")
            if d10p is not None:
                nd = d10p.loc[p["planted"]].n_dup_chunks
                assert nd == 0, \
                    (f"d10 flagged {nd} dup chunks on planted {p['planted']} — "
                     "the generator's chunk-clean guarantee broke")
        extra = " + d10 blindness confirmed" if d10p is not None else ""
        print(f"d19: all {len(man['sub_pairs'])} offset-shifted paragraphs "
              f"recovered as dup spans{extra}")

    # ---------------- d12 (optional): keep/drop verdict on plants ------
    # every planted 2.0x copy (the d9 plants AND the d18 eval-side
    # plants) has cosine exactly 1.0 with its base, so the SemDeDup
    # prune must land base and copy in ONE component and DROP the copy
    # (the base id is always smaller, so the copy can never be the
    # component min) — the keep/drop verdict the r07 verdict flagged as
    # the one sf1 exclusion with no direct planted evidence
    if glob.glob(f"{outdir}/d12_semdedup_prune/*.parquet"):
        d12 = load(outdir, "d12_semdedup_prune").set_index("id")
        pairs = [(p["base"], p["planted"]) for p in man["emb_pairs"]] + \
                [(p["train"], p["eval_copy"]) for p in man.get("d18_pairs", [])]
        for a, b in pairs:
            ra, rb = d12.loc[a], d12.loc[b]
            assert ra.component == rb.component, \
                f"d12: planted pair ({a},{b}) split across components " \
                f"{ra.component}/{rb.component}"
            assert rb.keep == 0, f"d12: planted copy {b} must be dropped"
            assert ra.cluster_size >= 2 and rb.cluster_size >= 2, \
                f"d12: pair ({a},{b}) cluster_size < 2"
        print(f"d12: all {len(pairs)} planted copies merged with their base "
              "and verdicted DROP (base kept unless merged lower)")

    # ---------------- d18 (optional): sided semantic decontam ----------
    # the eval-side 2.0x copies force their TRAIN base contaminated at
    # max_cosine exactly 1.0 across the side boundary
    if glob.glob(f"{outdir}/d18_decontam_embed/*.parquet") and man.get("d18_pairs"):
        d18 = load(outdir, "d18_decontam_embed").set_index("doc_id")
        for p in man["d18_pairs"]:
            row = d18.loc[p["train"]]
            assert row.contaminated == 1 and row.n_eval_matches >= 1, \
                f"d18: train {p['train']} not verdicted contaminated " \
                f"(eval copy {p['eval_copy']}): {dict(row)}"
            assert abs(row.max_cosine - 1.0) < 5e-5, \
                f"d18: train {p['train']} max_cosine {row.max_cosine} != 1.0"
        print(f"d18: all {len(man['d18_pairs'])} cross-side paraphrase plants "
              "verdicted contaminated at cosine 1.0")

    print("\nplanted cross-shard near-dups @ sf1: ALL CHECKS PASS")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
