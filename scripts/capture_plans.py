"""Capture `.explain("formatted")` for every registry query into a directory.

Used to produce the per-round before/after plan evidence
(``plans/r12/<query>_before.txt`` / ``_after.txt``): run once in a
worktree pinned at the previous round's final commit and once at HEAD,
then keep the pairs whose normalized plans differ.

Usage:
    python scripts/capture_plans.py /tmp/plans_head
    python scripts/capture_plans.py /tmp/plans_head --only gini_revenue_concentration,anova_f_oneway
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    # argv guard (advisor, round 12): missing args print usage, not a
    # bare IndexError
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    out_dir = sys.argv[1]
    only: list[str] = []
    if "--only" in sys.argv:
        idx = sys.argv.index("--only")
        if idx + 1 >= len(sys.argv):
            print(__doc__, file=sys.stderr)
            raise SystemExit(2)
        only = sys.argv[idx + 1].split(",")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture-plans")
    specs = load_all()
    names = only or sorted(specs)
    for i, name in enumerate(names):
        if name not in specs:
            print(f"[{i + 1}/{len(names)}] {name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        try:
            df = specs[name].builder(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue().rstrip() + "\n"
        except Exception:
            text = "BUILD FAILED\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(text)
        print(f"[{i + 1}/{len(names)}] {name}", file=sys.stderr)
    print(out_dir)


if __name__ == "__main__":
    main()
