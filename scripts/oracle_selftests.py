#!/usr/bin/env python3
"""Edge-branch self-tests for oracle SQL that the sf0.01 gate never fires.

Usage: python3 scripts/oracle_selftests.py <verifyOutDir>

Reads oracle_sql.json from a graft.Verify dump and exercises the branches
a healthy corpus cannot reach — currently the BPE trainer's EXHAUSTION
fallback (every word collapses to one token before BpeMerges rounds):
each oracle round must then carry the previous token state forward via
its sentinel merge row, mirroring the engine's early stop. A regression
here would only surface as a driver-round correctness failure on an
exhausting corpus, with no local signal — this pins it.
"""
import json
import os
import sys

import duckdb


def main():
    out_dir = sys.argv[1]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    fails = 0

    # Each section runs iff its queries are in the dump, so subset Verify
    # dumps still exercise whatever they carry.
    bpe = ["q95_bpe_vocab", "q96_bpe_encode", "q97_bpe_kernel_stats"]
    if all(q in oracle for q in bpe):
        # 'ab' corpus: round 1 merges (a,b) and every word becomes ONE
        # token, so rounds 2..N have no pairs -> the sentinel branch must
        # fire.
        con.execute("""CREATE VIEW documents AS
            SELECT * FROM (VALUES (0, 'ab ab ab'), (1, 'ab')) t(doc_id, text)""")

        q95 = con.execute(oracle["q95_bpe_vocab"]).fetchall()
        if q95 != [(1, "a", "b", 4)]:
            print(f"  x q95 exhaustion: expected [(1,'a','b',4)], got {q95}")
            fails += 1
        else:
            print("  ok q95 emits only the real merge (sentinels filtered)")

        expect96 = [(0, 3, 3, 2), (1, 1, 1, 2)]
        for q in ("q96_bpe_encode", "q97_bpe_kernel_stats"):
            got = con.execute(oracle[q]).fetchall()
            if got != expect96:
                print(f"  x {q} exhaustion: expected {expect96}, got {got}")
                fails += 1
            else:
                print(f"  ok {q} carries the last token state forward")
    else:
        print("  skip BPE sections (subset dump)")
        con.execute("""CREATE VIEW documents AS
            SELECT * FROM (VALUES (0, 'ab ab ab'), (1, 'ab')) t(doc_id, text)""")

    # q115 KMV exact mode: every lang has far fewer distinct trigrams than
    # k=128, so the union sketch is the whole union and the CASE branch
    # est_union = n_kept must fire (sf0.01's closed-vocab corpus always
    # has >= k trigrams per lang, so the gate never reaches this branch).
    if "q115_kmv_overlap" in oracle:
        con.execute("DROP VIEW documents")
        con.execute("""CREATE VIEW documents AS SELECT * FROM (VALUES
            (0, 'a b c d e f', 'en', 'src0', 11),
            (1, 'a b c x y z', 'de', 'src0', 11))
            t(doc_id, text, lang, source, n_chars)""")
        rows = con.execute(oracle["q115_kmv_overlap"]).fetchall()
        ok = len(rows) == 1
        if ok:
            (la, lb, n_kept, kth, n_common, n_exact, est_u, est_i) = rows[0]
            # 4 trigrams/side, 1 shared -> 7 distinct union hashes
            # exact mode: est_union is the union size and est_inter
            # collapses to the EXACT intersection (rho denominator is the
            # union sketch's size, not k)
            ok = (la, lb, n_kept, n_common, n_exact) == ("de", "en", 7, 1, 1) \
                and est_u == 7.0 and est_i == 1.0
        if ok:
            print("  ok q115 exact-mode branch: est_union == union size")
        else:
            print(f"  x q115 exact-mode: got {rows}")
            fails += 1

    # q116 edge branches: docs shorter than the 8-token span produce NO
    # grams (empty range -> zero coverage, kept == whole doc), and fully
    # duplicated docs mask down to kept_text = '' (md5 of empty string).
    if "q116_span_dedup" in oracle:
        con.execute("DROP VIEW documents")
        con.execute("""CREATE VIEW documents AS SELECT * FROM (VALUES
            (0, 'a b c d e f g h i j'),
            (1, 'a b c d e f g h i j'),
            (2, 'x y z'),
            (3, 'p q r s t u v w aa bb')) t(doc_id, text)""")
        md5 = lambda s: con.execute("SELECT md5(?)", [s]).fetchone()[0]
        want = [
            (0, 10, 10, 0, 0.0, md5("")),
            (1, 10, 10, 0, 0.0, md5("")),
            (2, 3, 0, 3, 1.0, md5("x y z")),
            (3, 10, 0, 10, 1.0, md5("p q r s t u v w aa bb"))]
        got = con.execute(oracle["q116_span_dedup"]).fetchall()
        if got == want:
            print("  ok q116 short-doc + full-mask branches")
        else:
            print(f"  x q116 edges: expected {want}, got {got}")
            fails += 1

    # q169 SQ8 clamp branch: delta lanes OUTSIDE the slice-trained
    # bounds must pin to the edge levels (255 above hi, 0 below lo).
    # sf0.01 fires this only incidentally (13 lanes at seed 42), so a
    # testdata regeneration could silently stop covering it — this
    # synthetic corpus forces both edges: slice codes are 0/127/255 per
    # construction, the +99 delta clamps onto the hi row's code exactly
    # and the -99 delta onto the lo row's, making each delta row some
    # query's distance-0 rank-1 neighbor.
    if "q169_sq_index_update" in oracle:
        con.execute("""CREATE OR REPLACE VIEW embeddings AS
            SELECT * FROM (VALUES
              (1, list_transform(range(1, 65), i -> 0.0)),
              (2, list_transform(range(1, 65), i -> 1.0)),
              (3, list_transform(range(1, 65), i -> 0.5)),
              (10, list_transform(range(1, 65), i -> 99.0)),
              (20, list_transform(range(1, 65), i -> -99.0)))
            t(vec_id, embedding)""")
        got = con.execute(oracle["q169_sq_index_update"]).fetchall()
        rank1 = [r for r in got if r[1] == 1]
        want1 = [(1, 1, 20, 0), (2, 1, 10, 0), (3, 1, 1, 64 * 127 * 127)]
        if len(got) == 12 and rank1 == want1:
            print("  ok q169 clamp branch: out-of-range deltas pin to edge levels")
        else:
            print(f"  x q169 clamp: expected rank1 {want1} in 12 rows, "
                  f"got {rank1} in {len(got)}")
            fails += 1

    print(f"ORACLE SELFTESTS {'FAIL' if fails else 'PASS'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
