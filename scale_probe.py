"""Above-gate scale probe: replicate the sf0.1 documents table 10x (5k
-> 50k docs, doc_id-offset, per-replica text suffix on 2/3 of docs so the
duplicate structure stays rich without being degenerate) and run the
text/dedup families at a corpus size where the size-adaptive gates flip
NATURALLY (50k > the 25k driver-fold cap) — the distributed plans get
wall-clock signal on real above-gate inputs, not just forced-off gates.

Usage: python scale_probe.py  (writes the probe dataset under
$TOMIX_PROBE_DIR, default /tmp/sfx10, then prints name,spark_s,duckdb_s,
ratio,rows per query). Results are recorded in ARCHITECTURE.md round 10.

This is a measurement harness, not part of the engine; the per-round
BENCH contract stays bench.py at the driver-provided sf_dir.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ORACLE_TIMEOUT_S = int(os.environ.get("TOMIX_PROBE_ORACLE_TIMEOUT_S", "90"))

PROBE_NAMES = [
    "token_count", "word_freq", "tfidf_keywords", "bm25_topk",
    "cms_heavy_hitters", "simhash", "simhash_pairs", "dedup_exact",
    "doc_fingerprint", "substring_dup_stats", "substring_dup_spans",
    "substring_dedup_clean", "minhash_signature", "minhash_lsh_pairs",
    "lsh_keep_list", "ngram_jaccard_pairs", "dedup_keep_list",
    "neardup_components", "neardup_keep_best", "lang_id", "quality_score",
    "gopher_quality", "chunk_documents",
]


def build_dataset(src_sf: str, dst: str, replicas: int = 10) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + rr.r * 1000000 AS doc_id,
                 CASE WHEN d.doc_id % 3 = 0 THEN d.text
                      ELSE d.text || ' r' || CAST(rr.r AS VARCHAR) END AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{src_sf}/documents.parquet') d,
               (SELECT unnest(range({replicas})) AS r) rr
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        if not os.path.exists(f"{dst}/{t}.parquet"):
            shutil.copyfile(f"{src_sf}/{t}.parquet", f"{dst}/{t}.parquet")


def main() -> None:
    import duckdb

    from tomixpanel_spark.operators import registry
    from tomixpanel_spark.session import ensure_semantics, session_builder

    os.environ.setdefault("TOMIX_CACHE_TABLES", "1")
    os.environ.setdefault("TOMIX_CACHE_PARTS", "8")
    os.environ.setdefault("TOMIX_CACHE_PARTS_MIN_MB", "0.4")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("TOMIX_PROBE_DIR", "/tmp/sfx10")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if not os.path.exists(f"{dst}/documents.parquet"):
        build_dataset(src, dst)
    spark = (
        session_builder("tomix_scale_probe", master=f"local[{cpus}]",
                        shuffle_partitions=cpus)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_semantics(spark)
    reg = registry()
    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet'")
    print("name,spark_s,duckdb_s,ratio,rows")
    for n in PROBE_NAMES:
        if n not in reg:
            continue
        try:
            print(f"# running {n}", file=sys.stderr, flush=True)
            fn = reg[n].fn
            nrows = len(fn(spark, dst).toPandas())  # warm plan + codegen
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, dst).toPandas()
                best = min(best, time.perf_counter() - t0)
            ob = float("inf")
            timed_out = False
            if reg[n].oracle:
                # watchdog: several pair oracles are O(n^2) in SQL — at
                # 50k docs that's 2.5e9 pairs and tens of GB. An
                # interrupted oracle IS the probe's finding (the capped/
                # banded Spark plan completes where naive SQL cannot).
                import threading

                for _ in range(2):
                    timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
                    timer.start()
                    t0 = time.perf_counter()
                    try:
                        con.execute(reg[n].oracle).fetchall()
                        ob = min(ob, time.perf_counter() - t0)
                    except Exception:
                        timed_out = True
                        break
                    finally:
                        timer.cancel()
            if timed_out:
                print(f"{n},{best:.2f},TIMEOUT>{ORACLE_TIMEOUT_S}s,,{nrows}", flush=True)
            else:
                ratio = best / ob if ob < float("inf") else -1
                osec = ob if ob < float("inf") else -1
                print(f"{n},{best:.2f},{osec:.2f},{ratio:.2f},{nrows}", flush=True)
        except Exception as exc:  # keep probing; record the failure
            print(f"{n},ERR,,,{repr(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
