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
    need = ["q95_bpe_vocab", "q96_bpe_encode", "q97_bpe_kernel_stats"]
    missing = [q for q in need if q not in oracle]
    if missing:
        print(f"SKIP: dump lacks {missing} (ran Verify with a subset?)")
        sys.exit(0)

    con = duckdb.connect()
    # 'ab' corpus: round 1 merges (a,b) and every word becomes ONE token,
    # so rounds 2..N have no pairs -> the sentinel branch must fire.
    con.execute("""CREATE VIEW documents AS
        SELECT * FROM (VALUES (0, 'ab ab ab'), (1, 'ab')) t(doc_id, text)""")

    fails = 0

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

    print(f"ORACLE SELFTESTS {'FAIL' if fails else 'PASS'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
