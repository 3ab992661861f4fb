"""Like stage_probe, but reports executorCpuTime (ms) alongside runTime —
on a box with ambient hypervisor throttling, runTime overstates task cost
by the wait factor; CPU is the honest per-stage cost. Usage:

    python tools/cpu_probe.py [--sf DIR] q [q ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from insight_patents_spark import registry  # noqa: E402
from insight_patents_spark.runtime import release_ephemeral  # noqa: E402
from tools.stage_probe import probe_session  # noqa: E402


def stage_cpu_rows(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages"
    ) as r:
        data = json.load(r)
    return [
        (
            s["stageId"],
            s["numTasks"],
            s.get("executorRunTime", 0),
            s.get("executorCpuTime", 0) // 1_000_000,
            s.get("name", "")[:60],
        )
        for s in data
        if s.get("status") in ("COMPLETE", "ACTIVE")
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--min-ms", type=int, default=200)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    specs = registry.load_all()
    spark = probe_session()
    specs["agg_groupby"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    seen = {r[0] for r in stage_cpu_rows(spark)}
    for name in args.queries:
        t0 = time.time()
        specs[name].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        rows = [r for r in stage_cpu_rows(spark) if r[0] not in seen]
        seen |= {r[0] for r in rows}
        tot_cpu = sum(r[3] for r in rows)
        print(
            f"== {name}: wall={wall:.2f}s stages={len(rows)} "
            f"totalCpu={tot_cpu}ms",
            file=sys.stderr,
        )
        for sid, nt, rt, cpu, nm in sorted(rows):
            if rt >= args.min_ms:
                print(
                    f"  stage {sid}: tasks={nt} run={rt}ms cpu={cpu}ms {nm}",
                    file=sys.stderr,
                )
        release_ephemeral(spark)
    spark.stop()


if __name__ == "__main__":
    main()
