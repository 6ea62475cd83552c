#!/usr/bin/env python3
"""Generate a scaled-up synthetic dataset for SCALING-CURVE benchmarks.

Usage: python3 scripts/gen_scale.py <outDir> <factor>

Builds <outDir> with the tables the heavy benchmark queries read, at
~<factor> x the row counts of /root/testdata/sf0.1 (so factor=5 ~ sf0.5).
NOT a correctness fixture — the driver's sf dirs stay authoritative for
the oracle gate; this exists only to measure sec/row slope at two scales
(BASELINE.md scaling table).

Construction choices, chosen to keep the scaling measurement honest:
  * lineitem: sf0.1 replicated <factor> times with l_orderkey offsets —
    bulk-roundtrip queries (q32/q41) group/sort on keys, so replicas with
    fresh keys scale the work linearly without changing distributions.
  * documents / embeddings: FRESH hash-generated rows (same vocab, value
    range, and length distributions as sf0.1). Plain replication would
    create <factor>-way near-duplicate clusters and quadratically inflate
    dedup/fuzzy-join pair counts — measuring the distortion, not the
    engine.
  * region/nation: copied verbatim (dimension tables; Bench warmup reads
    nation).

Deterministic: all values derive from DuckDB hash() of row ids.
"""
import math
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

VOCAB = ["join", "hash", "row", "batch", "scan", "customer", "column",
         "filter", "small", "merge", "slow", "order", "vector", "line",
         "table", "data", "agg", "value", "key", "stream", "window",
         "spark", "a", "group", "part", "big", "sort", "query", "fast",
         "the", "dup"]


def main():
    out, factor = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    # lineitem: replicate with key offsets
    maxkey = con.execute(
        f"SELECT max(l_orderkey) + 1 FROM read_parquet('{SRC}/lineitem.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT l.* REPLACE (l.l_orderkey + c.i * {maxkey} AS l_orderkey)
          FROM read_parquet('{SRC}/lineitem.parquet') l,
               range({factor}) c(i)
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

    # orders: replicate with key offsets (same rationale as lineitem —
    # the DML/time-travel queries key on o_orderkey, so fresh keys scale
    # the merge-on-read work linearly without changing the %-bucket
    # distributions the change batches select on)
    omax = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT o.* REPLACE (o.o_orderkey + c.i * {omax} AS o_orderkey)
          FROM read_parquet('{SRC}/orders.parquet') o,
               range({factor}) c(i)
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")

    # documents: fresh text with a HEAPS-LAW vocabulary — real corpora
    # grow distinct-word counts ~ N^0.5 with corpus size, so the scale
    # corpus extends the 31 base words with hash-suffixed variants
    # (|vocab| ~ 31*sqrt(factor)). A fixed 31-word vocab at 25x+ makes
    # cross-doc gram similarity mass grow QUADRATICALLY by construction
    # (measured: 37.8M char-8-gram LSH candidates at 25x, all genuinely
    # 0.3-0.5-similar, output empty) — the q71 fixed-code-space lesson
    # (round 9) applied to text: scaling measurements must not bake in a
    # closed-world density no real corpus has.
    vmult = max(1, round(math.sqrt(factor)))
    vocab = list(VOCAB) + [
        f"{w}{k}" for k in range(vmult - 1) for w in VOCAB]
    vocab_sql = "[" + ", ".join(f"'{w}'" for w in vocab) + "]"
    ndocs = factor * con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          WITH d AS (
            SELECT i AS doc_id,
              array_to_string(list_transform(range(CAST(8 + hash(i) % 89 AS BIGINT)),
                j -> ({vocab_sql})[CAST(1 + hash(i * 131 + j) % {len(vocab)} AS BIGINT)]),
                ' ') AS text
            FROM range({ndocs}) t(i))
          SELECT doc_id, text,
            (['en','zh','de','fr','es'])[CAST(1 + hash(doc_id * 7) % 5 AS BIGINT)] AS lang,
            'src' || CAST(hash(doc_id * 13) % 20 AS VARCHAR) AS source,
            length(text) AS n_chars
          FROM d
        ) TO '{out}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 4096)""")
    # ROW_GROUP_SIZE 4096: Spark can split a parquet FILE only at
    # row-group boundaries — DuckDB's default (~122k rows/group) packs a
    # 25x corpus into 2 groups, so per-row kernel scans (tokenizer
    # encodes) ran on 2 of 32 cores no matter what
    # spark.sql.files.maxPartitionBytes said (the q130/q149 plateau,
    # BASELINE.md round 15). 4096-row groups give the scan ~30 splits at
    # 25x with maxPartitionBytes=512k — the local stand-in for a real
    # corpus's many files.

    # embeddings: fresh 64-dim vectors, uniform in sf0.1's value range
    nvec = factor * con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT i AS vec_id,
            CAST(list_transform(range(64), j ->
              (CAST(hash(i * 64 + j) % 700000 AS DOUBLE) / 1000000.0) - 0.35)
              AS FLOAT[]) AS embedding,
            CAST(hash(i * 17) % 10 AS INT) AS label
          FROM range({nvec}) t(i)
        ) TO '{out}/embeddings.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 4096)""")

    # events: replicate with ENTITY offsets — the versioned-cell queries
    # (q101 SCD2 etc.) window on (user_id, event_type), so offsetting
    # user_id keeps each cell's version-chain depth at its sf0.1 value
    # while the number of cells scales: 5x the rows = 5x the entities,
    # not 5x-deeper windows (which would measure chain growth, not the
    # engine).
    maxeid, maxuid = con.execute(
        f"SELECT max(event_id) + 1, max(user_id) + 1 "
        f"FROM read_parquet('{SRC}/events.parquet')").fetchone()
    con.execute(f"""
        COPY (
          SELECT e.* REPLACE (e.event_id + c.i * {maxeid} AS event_id,
                              e.user_id + c.i * {maxuid} AS user_id)
          FROM read_parquet('{SRC}/events.parquet') e,
               range({factor}) c(i)
        ) TO '{out}/events.parquet' (FORMAT PARQUET)""")

    gen_clustered(con, out, nvec)

    for t in ("lineitem", "documents", "embeddings", "events",
              "embeddings_clustered"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


def gen_clustered(con, out, nvec):
    """embeddings_clustered: a seeded GAUSSIAN-MIXTURE corpus for ANN
    recall curves. The uniform `embeddings` table is the adversarial
    FLOOR for IVF (no cluster structure for cells to capture —
    BASELINE.md's recall table on it cannot inform nprobe defaults for
    real embeddings); this table is the representative counterpart:
    K=256 mixture components (matching the engine's sqrt(n) centroid
    ladder at 25x), component centers uniform in the same value range as
    the uniform corpus, per-dim noise ~ Gaussian via a 3-uniform
    CLT sum with sigma = 0.10 (center spread sigma = 0.20, so components
    overlap at the margins but are well separated in 64-dim). Everything
    derives from DuckDB hash() — fully deterministic, no RNG state."""
    K = 256
    noise_sum = " + ".join(
        f"(CAST(hash(i * 200003 + j * 31 + {t}) % 1000 AS DOUBLE) / 1000.0)"
        for t in (1, 2, 3))
    con.execute(f"""
        COPY (
          SELECT i AS vec_id,
            CAST(list_transform(range(64), j ->
              ((CAST(hash((hash(i * 31) % {K}) * 97 + j) % 700000 AS DOUBLE)
                 / 1000000.0) - 0.35)
              + 0.3 * ((({noise_sum}) / 1.5) - 1.0)
            ) AS FLOAT[]) AS embedding,
            CAST(hash(i * 31) % {K} AS INT) AS label
          FROM range({nvec}) t(i)
        ) TO '{out}/embeddings_clustered.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 4096)""")


def main_clustered_only():
    """`gen_scale.py <outDir> <factor> clustered`: (re)generate only the
    clustered-embeddings table into an existing scale dir."""
    out, factor = sys.argv[1], int(sys.argv[2])
    con = duckdb.connect()
    nvec = factor * con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    gen_clustered(con, out, nvec)
    print(f"embeddings_clustered: {nvec} rows")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "clustered":
        main_clustered_only()
    else:
        main()
