#!/usr/bin/env python3
"""Sharded DuckDB oracle for q97_trigram_lm at large scale factors.

The plain q97 oracle joins the token-scale trigram stream against the full
trigram AND bigram count tables in one query; at sf1 that intermediate
exhausts a single node's RAM+disk (the round-8 ceiling). This tool computes
the IDENTICAL result with bounded memory by exploiting that the integer
surprisal splits into two independent terms:

    s = len(bin(c2(ctx) + V)) - len(bin(c3(g) + 1))
    sum_surprisal(doc) = SUM over trigram occurrences of term1(ctx)
                       - SUM over trigram occurrences of term2(g)

Each term is ONE equi-join keyed on its own column (ctx or g), so it shards
cleanly by hash(key) % K: shard k builds only 1/K of the count table and
probes only the matching 1/K of the occurrences — both sides of every join
filter on the SAME predicate, so the union of shard partials is exactly the
unsharded sum. V and per-doc trigram counts are single aggregate passes.
CPU cost is ~K extra corpus scans; peak memory drops by ~K.

Usage: python3 tools/q97_shard_oracle.py <verify_out_dir> <sf_dir> [K=8]

Compares against <verify_out_dir>/q97_trigram_lm/ with selfcheck.py's own
comparator and prints the same OK/FAIL line.
"""
import sys, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck  # noqa: E402  (compare/normalize/load_spark)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    con = duckdb.connect()
    p = f"{sfdir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW documents AS SELECT * FROM {src}")

    tok = r"""tok AS (SELECT doc_id, string_split_regex(lower(text), '\s+') ws
                      FROM documents)"""

    # V: distinct unigrams — one aggregate pass, no join
    v = con.sql(
        f"WITH {tok} SELECT CAST(count(DISTINCT w) AS BIGINT) "
        f"FROM (SELECT unnest(ws) w FROM tok)").fetchone()[0]
    print(f"[q97-shard] V = {v}", flush=True)

    # per-doc trigram counts — one aggregate pass, no join
    con.sql(f"""CREATE TABLE nt AS
        WITH {tok}
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams
        FROM (SELECT doc_id, unnest(range(1, len(ws) - 1)) i
              FROM tok WHERE len(ws) >= 3)
        GROUP BY doc_id""")

    con.sql("CREATE TABLE t1 (doc_id BIGINT, s BIGINT)")  # ctx-term partials
    con.sql("CREATE TABLE t2 (doc_id BIGINT, s BIGINT)")  # g-term partials

    # trigram occurrences with both keys; re-derived per shard (CPU for RAM)
    tri = """tri AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g,
                            ws[i] || ' ' || ws[i+1] AS ctx
                     FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) i
                           FROM tok WHERE len(ws) >= 3))"""
    big = """big AS (SELECT ws[i] || ' ' || ws[i+1] AS ctx
                     FROM (SELECT ws, unnest(range(1, len(ws))) i
                           FROM tok WHERE len(ws) >= 2))"""

    for k in range(K):
        # term2: len(bin(c3(g)+1)) over shard-k trigrams; both the count
        # table and the probe stream carry the SAME shard predicate
        con.sql(f"""INSERT INTO t2
            WITH {tok}, {tri},
            sh AS (SELECT doc_id, g FROM tri WHERE hash(g) % {K} = {k}),
            c3 AS (SELECT g, CAST(count(*) AS BIGINT) c3 FROM sh GROUP BY g)
            SELECT doc_id, CAST(sum(length(bin(c3 + 1))) AS BIGINT)
            FROM sh JOIN c3 USING (g) GROUP BY doc_id""")
        # term1: len(bin(c2(ctx)+V)) over shard-k trigram CONTEXTS; c2 counts
        # come from the full BIGRAM stream (positions 1..len-1), restricted
        # to the same ctx shard
        con.sql(f"""INSERT INTO t1
            WITH {tok}, {tri}, {big},
            sh AS (SELECT doc_id, ctx FROM tri WHERE hash(ctx) % {K} = {k}),
            c2 AS (SELECT ctx, CAST(count(*) AS BIGINT) c2 FROM big
                   WHERE hash(ctx) % {K} = {k} GROUP BY ctx)
            SELECT doc_id, CAST(sum(length(bin(c2 + {v}))) AS BIGINT)
            FROM sh JOIN c2 USING (ctx) GROUP BY doc_id""")
        print(f"[q97-shard] shard {k + 1}/{K} done", flush=True)

    duck = con.sql("""
        WITH s1 AS (SELECT doc_id, CAST(sum(s) AS BIGINT) a FROM t1 GROUP BY doc_id),
             s2 AS (SELECT doc_id, CAST(sum(s) AS BIGINT) b FROM t2 GROUP BY doc_id)
        SELECT nt.doc_id, CAST(a - b AS BIGINT) AS sum_surprisal, nt.n_trigrams,
               CAST(a - b AS DOUBLE) / CAST(nt.n_trigrams AS DOUBLE) AS mean_surprisal
        FROM nt JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)
        ORDER BY doc_id""").df()

    spark = selfcheck.load_spark(outdir, "q97_trigram_lm")
    if spark is None:
        print("FAIL     q97_trigram_lm: no spark result in", outdir)
        sys.exit(1)
    issues = selfcheck.compare("q97_trigram_lm", spark, duck)
    issues = [i for i in issues if not i.startswith("FLOAT_ULP")]
    if issues:
        print(f"FAIL     q97_trigram_lm ({len(spark)} rows): " + "; ".join(issues[:3]))
        sys.exit(1)
    print(f"OK       q97_trigram_lm ({len(spark)} rows, sharded oracle K={K})")


if __name__ == "__main__":
    main()
