"""Isolated re-measurement of the worst bench deltas.

The per-round driver bench runs under unknown host contention (r3's
361 s record was ~2.2x a clean run, and the biggest per-query
"regressions" did not reproduce in isolation — VERDICT r3). This tool
makes noise-vs-regression decidable from committed artifacts alone:

    python tools/bench_compare.py [N] [--against BENCH_file.json]

1. reads the committed BENCH_local.json (per-query record) and the
   comparison file (default: the newest BENCH_r*.json),
2. picks the N (default 8) queries with the largest time ratio
   (comparison / committed),
3. re-runs each IN ISOLATION (one fresh single-purpose SparkSession,
   registry order preserved for cache-ownership queries: a cache
   builder's consumers are re-run after their builder),
4. writes BENCH_compare.json: {query: {committed, recorded, isolated}}.

A query whose `isolated` lands near `committed` was contention noise;
one that reproduces near `recorded` is a real regression.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_worst = int(args[0]) if args else 8
    against = None
    for i, a in enumerate(sys.argv[1:]):
        if a == "--against":
            against = sys.argv[1:][i + 1]
    if against is None:
        rounds = sorted(glob.glob(str(REPO / "BENCH_r*.json")))
        against = rounds[-1] if rounds else None

    committed = json.loads((REPO / "BENCH_local.json").read_text())["queries"]
    recorded: dict[str, float] = {}
    if against and os.path.exists(against):
        rec = json.loads(Path(against).read_text())
        # driver records keep per-query detail under parsed.queries or
        # queries; tolerate both (family subtotals are skipped by the
        # name-intersection below).
        rec_q = (rec.get("parsed") or {}).get("queries") or rec.get("queries") or {}
        recorded = {k: v for k, v in rec_q.items() if k in committed}

    ratios = {
        name: (recorded.get(name, 0.0) / committed[name])
        for name in committed
        if committed[name] > 0 and recorded.get(name, 0.0) > 0
    }
    worst = sorted(ratios, key=lambda n: -ratios[n])[:n_worst]
    if not worst:  # no overlapping per-query record: take slowest committed
        worst = sorted(committed, key=lambda n: -committed[n])[:n_worst]

    from insight_patents_spark import registry
    from insight_patents_spark.session import get_spark

    specs = registry.load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ips-bench-compare")
    # same warm-up contract as bench.py
    for wname in ("agg_groupby", "udf_pandas_scalar", "vec_cosine_topk"):
        specs[wname].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # cache builders must run before their consumers, as in the full bench
    order = [n for n in specs if n in worst]
    out = {}
    for name in order:
        t0 = time.time()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = {
            "committed": committed.get(name),
            "recorded": recorded.get(name),
            "isolated": round(time.time() - t0, 3),
        }
        print(f"{name}: committed={out[name]['committed']} "
              f"recorded={out[name]['recorded']} isolated={out[name]['isolated']}")
    (REPO / "BENCH_compare.json").write_text(json.dumps(
        {"against": against, "sf_dir": sf_dir, "results": out}, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
