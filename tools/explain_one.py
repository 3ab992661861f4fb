"""Dump the formatted physical plan of one or more registered queries to
plans/<tag>/<query>_<suffix>.txt — the r13 optimization-evidence helper.

    python tools/explain_one.py --tag r13 --suffix before [--sf DIR] q [q ...]

Note: queries whose registered fn executes eager stages (checkpointed
loops, streaming runs) dump the plan of the RETURNED frame; the eager
stages appear as ExistingRDD leaves, same convention as PLANS.md.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from insight_patents_spark import registry  # noqa: E402
from insight_patents_spark.plans.explain import formatted_plan  # noqa: E402
from insight_patents_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    specs = registry.load_all()
    spark = get_spark("ips-explain")
    outdir = REPO / "plans" / args.tag
    outdir.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        df = specs[name].fn(spark, args.sf)
        p = outdir / f"{name}_{args.suffix}.txt"
        p.write_text(
            f"-- {name} ({args.suffix}) @ sf_dir={args.sf}\n"
            + formatted_plan(df).rstrip()
            + "\n"
        )
        print(f"wrote {p}")
    spark.stop()


if __name__ == "__main__":
    main()
