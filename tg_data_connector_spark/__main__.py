"""CLI entry point — the reference's ``python datax.py job.json`` launcher
(``core/src/main/bin/datax.py:30-34`` builds the Engine.main invocation;
``Engine.java`` entry point A in SURVEY §3).

Run locally or under spark-submit; the job config is the same declarative
JSON the library's ``run_job`` takes:

    python -m tg_data_connector_spark job.json
    spark-submit --py-files tg_data_connector_spark.zip \
        -m tg_data_connector_spark job.json          # or a thin runner script

``--dry-run`` maps to the reference's preCheck mode (validate readers,
transformers, SQL and writers without moving data) and exits non-zero when
problems are found. The final stats line mirrors JobContainer.logStatistics
(records read/written/dirty + wall seconds) as one JSON object on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="tg_data_connector_spark",
        description="Run one declarative reader->transform->writer job.",
    )
    ap.add_argument("job", help="path to the job config JSON")
    ap.add_argument(
        "--dry-run", action="store_true",
        help="preCheck only: validate the config end-to-end, move no data",
    )
    ap.add_argument(
        "--master", default=None,
        help="Spark master override (default: whatever the environment / "
        "spark-submit provides)",
    )
    args = ap.parse_args(argv)

    from .job import load_config, pre_check, run_job
    from .session import get_spark

    cfg = load_config(args.job)
    spark = get_spark(app_name="tg_data_connector_job", master=args.master)
    try:
        if args.dry_run:
            problems = pre_check(spark, cfg)
            for p in problems:
                print(f"PROBLEM: {p}", file=sys.stderr)
            print(json.dumps({"dry_run": True, "problems": len(problems)}))
            return 1 if problems else 0
        res = run_job(spark, cfg)
        print(json.dumps(dataclasses.asdict(res)))
        return 0
    finally:
        if args.master is not None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
