"""Same-window interleaved A/B: does the r3 joiner-run pre-gate (one extra
RE2 scan of the batch text in _tokenize_arrow) explain the r3 minhash /
near-dup / fingerprint slowdown, or was it host noise?

One leg = one subprocess (fresh Spark; the toggle is read at import time
by local Python workers):
  A = current code (pre-gate on)
  B = SPARK_GRAFT_SKIP_JOINER_RECHECK=1 (pre-gate skipped)
Legs alternate A,B,A,B,... so both variants sample every time window
(the BENCH.md interleaving protocol); each leg also times a pure-CPU
calibration loop so host drift is visible per leg.

Usage:
  python tools/ab_joiner.py --leg a|b     # one leg, prints one JSON line
  python tools/ab_joiner.py --rounds 3    # full interleaved campaign
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _busy(_):
    x = 0
    for i in range(10_000_000):
        x += i * i
    return x


def calibrate(nproc: int = 8) -> float:
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(nproc) as p:
        p.map(_busy, range(nproc * 4))
    return round(nproc * 4 / (time.time() - t0), 2)


def run_leg(leg: str) -> dict:
    # env must be set before pyspark / worker startup
    if leg == "b":
        os.environ["SPARK_GRAFT_SKIP_JOINER_RECHECK"] = "1"
    sys.path.insert(0, REPO)
    from lucene_solr_spark.functions import dedup as D
    from lucene_solr_spark.plans.gate import registry
    from lucene_solr_spark.session import get_spark

    spark = get_spark(f"ab_joiner_{leg}", cores=CORES,
                      shuffle_partitions=CORES)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = {"leg": leg, "cal_before": calibrate()}
    # warm-up: JIT/allocator + parquet footer caches (untimed)
    D.minhash_signatures_np(docs.limit(2000)).collect()
    t0 = time.time()
    D.lsh_candidate_pairs_np(docs).collect()
    out["a_minhash_np_pairs"] = round(time.time() - t0, 3)
    t0 = time.time()
    D.near_dup_pipeline(docs).collect()
    out["a_near_dup_pipeline"] = round(time.time() - t0, 3)
    fp = registry()["fingerprint"][0]
    t0 = time.time()
    fp(spark, SF_DIR).collect()
    out["a_fingerprint"] = round(time.time() - t0, 3)
    out["cal_after"] = calibrate()
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=["a", "b"])
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    if args.leg:
        print(json.dumps(run_leg(args.leg)))
        return
    rows = []
    for r in range(args.rounds):
        for leg in ("a", "b"):
            p = subprocess.run(
                [sys.executable, __file__, "--leg", leg],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"leg {leg} round {r} FAILED:\n{p.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            d = json.loads(line[-1])
            d["round"] = r
            rows.append(d)
            print(json.dumps(d), flush=True)
    # summary: best-per-leg and paired medians
    import statistics as st

    summary = {}
    for key in ("a_minhash_np_pairs", "a_near_dup_pipeline",
                "a_fingerprint"):
        for leg in ("a", "b"):
            vals = [x[key] for x in rows if x["leg"] == leg]
            if vals:
                summary[f"{key}_{leg}_med"] = round(st.median(vals), 3)
                summary[f"{key}_{leg}_best"] = min(vals)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
