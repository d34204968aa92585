"""Scale-replicate TESTDATA to a larger scale factor (default sf1).

/root/testdata is read-only and tops out at sf0.1, where Spark's fixed
per-query floor (~150-400 ms of planning/scheduling) dominates most
runtimes. To measure the data-proportional regime the bench needs a
bigger input; this tool builds one deterministically by tiling the
sf0.1 tables K times with key offsets:

- fact/dim keys shift by ``i * (max key)`` per copy, so FK integrity
  (orders->customer, lineitem->part/supplier/orders) is preserved and
  join fan-outs match the base data exactly;
- region/nation stay fixed (they are fixed-size in TPC-H at every SF);
- events keep their user_id values (hot keys get 10x hotter — the
  realistic direction) with ts shifted i seconds per copy;
- document texts get a per-copy suffix so the corpus is not 90%
  byte-identical duplicates (which would turn every LSH bucket into a
  10x clique); near-dup structure is preserved — suffixed copies still
  share almost all shingles with their original.

Marginal value distributions are byte-for-byte those of the driver's
generator; only key ranges grow. Output goes OUTSIDE the repo (default
/tmp/sparkgraft_sf1) — ~200 MB of parquet has no business in git.

``--organic`` (round-10 VERDICT ask #5) replaces the uniform tiling
of documents/embeddings with a SEEDED near-dup process so scale
evidence for the dedup/recall family stops riding on degenerate
K-cliques: each base row draws a cluster size from a mixed
distribution (50% singletons, 30% pairs, 15% size-4, 5% full-mult
cliques — all md5-seeded, reproducible), copies inside the cluster
are token-level mutations (documents: every ~12th token replaced
per copy; embeddings: per-dim jitter, cosine ~0.99 to the base) and
copies outside it are independent rows (md5 token soup / fresh
pseudo-random vectors). Key shifting and all other tables are
identical to the tiled mode.

Usage: python tools/gen_sf.py [--base /root/testdata/sf0.1] [--mult 10]
       [--out /tmp/sparkgraft_sf1] [--organic]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SCALED = {
    # table -> list of (key_col, offset_source_table) to shift per copy
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_AS_IS = ["region", "nation"]


def _cluster_size(key: str, mult: int) -> str:
    """Seeded mixed cluster-size distribution over the base key:
    50% singletons, 30% pairs, 15% size-4, 5% full-mult cliques."""
    h = f"CAST(concat('0x', substr(md5('cs' || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
    return (
        f"CASE WHEN ({h}) < 50 THEN 1"
        f" WHEN ({h}) < 80 THEN LEAST(2, {mult})"
        f" WHEN ({h}) < 95 THEN LEAST(4, {mult})"
        f" ELSE {mult} END"
    )


def _organic_text(mult: int, max_doc_id: int) -> str:
    """Copy i of a base doc: i=0 original; 0<i<cluster_size a
    token-mutated near-dup (every ~12th token replaced with a
    copy-specific marker — shingle overlap stays high); otherwise an
    independent md5 token soup (60-119 tokens, negligible overlap).

    PREFERENCE-PAIR SHAPE (round-13 VERDICT ask #8): in-cluster
    mutations SKIP the first 8 tokens — the q233/q257 prompt key —
    so every organic near-dup cluster doubles as a multi-response
    PROMPT GROUP (same prompt, divergent responses, md5-seeded
    reward spread via q257's doc_id-keyed rewards). This gives the
    post-training family (q257 preference pairs, q232/q233/q240
    prompt dedup) organic group structure at scale instead of the
    tiled replicas' all-or-nothing cliques. (Banner hosts add a
    second, heavier-tailed group shape: all banner docs on one host
    share the banner-led prompt key — the realistic boilerplate-
    prompt pathology.)

    PER-HOST BOILERPLATE (round-11 VERDICT #9): ~40% of docs
    (seeded) get a host-specific 10-token banner PREPENDED — exactly
    one _LINE_W chunk, so prepending keeps every later chunk
    boundary aligned. The host is derived from the FINAL (shifted)
    doc_id by the _synth_url rule ((doc_id div 4) % 40), so q223's
    host-scoped rule sees a genuine per-host repeated line on a
    realistic distribution; the near-dup clusters' cross-host shared
    chunks (copies land on different hosts after the id shift)
    remain the q212-only removals, so the two rules' difference is
    finally measurable at scale."""
    s = _cluster_size("doc_id", mult)
    soup_len = (
        "60 + CAST(concat('0x', substr(md5('sl' || CAST(doc_id AS VARCHAR)"
        " || '_' || i), 1, 8)) AS BIGINT) % 60"
    )
    soup = (
        "(SELECT string_agg('w' || substr(md5(CAST(doc_id AS VARCHAR) ||"
        " '_' || i || '_' || r.range), 1, 6), ' ')"
        f" FROM range(120) r WHERE r.range < ({soup_len}))"
    )
    mutated = (
        "array_to_string(list_transform("
        "string_split_regex(trim(text), '\\s+'),"
        " (t, j) -> CASE WHEN j > 8 AND (j + i) % 12 = 0 THEN 'm' ||"
        " CAST(i AS VARCHAR) ELSE t END), ' ')"
    )
    body = (
        f"CASE WHEN i = 0 THEN text"
        f" WHEN i < ({s}) THEN {mutated}"
        f" ELSE {soup} END"
    )
    fid = f"(doc_id + i * {max_doc_id})"
    host = f"(({fid} // 4) % 40)"
    has_banner = (
        f"CAST(concat('0x', substr(md5('bb' || CAST({fid} AS VARCHAR)),"
        " 1, 8)) AS BIGINT) % 100 < 40"
    )
    banner = (
        f"'hb' || CAST({host} AS VARCHAR) ||"
        " ' nav home about contact privacy terms login search end'"
    )
    return (
        f"CASE WHEN {has_banner} THEN ({banner}) || ' ' || ({body})"
        f" ELSE ({body}) END AS text"
    )


def _organic_embedding(mult: int) -> str:
    """Copy i of a base vector: i=0 original; in-cluster copies get
    seeded per-dim jitter (uniform +-0.05 — cosine ~0.99 to the
    base on the generator's unit-scale dims); out-of-cluster copies
    are fresh seeded uniform[-1,1] vectors."""
    s = _cluster_size("vec_id", mult)
    u = (
        "((CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR) || '_' ||"
        " i || '_' || j), 1, 8)) AS BIGINT) % 2001) - 1000) / 1000.0"
    )
    return (
        f"CASE WHEN i = 0 THEN embedding"
        f" WHEN i < ({s}) THEN list_transform(embedding,"
        f" (x, j) -> x + ({u}) * 0.05)"
        f" ELSE list_transform(embedding, (x, j) -> ({u})) END"
        f" AS embedding"
    )


def generate(base: str, out: str, mult: int, organic: bool = False) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    maxes = {
        t: con.sql(
            f"SELECT MAX({KEY_OF[t]}) FROM '{base}/{t}.parquet'"
        ).fetchone()[0]
        for t in KEY_OF
    }
    for t in COPY_AS_IS:
        con.sql(
            f"COPY (SELECT * FROM '{base}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, shifts in SCALED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{base}/{t}.parquet'"
            ).fetchall()
        ]
        shifted = {k: f"{k} + i * {maxes[src]}" for k, src in shifts}
        exprs = []
        for c in cols:
            if c in shifted:
                exprs.append(f"{shifted[c]} AS {c}")
            elif t == "events" and c == "ts":
                exprs.append("ts + i * INTERVAL 1 SECOND AS ts")
            elif t == "documents" and c == "text":
                exprs.append(
                    _organic_text(mult, maxes["documents"])
                    if organic
                    else "CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text"
                )
            elif organic and t == "embeddings" and c == "embedding":
                exprs.append(_organic_embedding(mult))
            else:
                exprs.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM '{base}/{t}.parquet', (SELECT UNNEST(range({mult})) AS i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sparkgraft_sf1")
    ap.add_argument("--organic", action="store_true")
    a = ap.parse_args()
    generate(a.base, a.out, a.mult, organic=a.organic)
