"""CLI entry point — reference parity surface.

Reference: ``python -m src.main --env … --checks … --report {all,html,csv,
none} --config-dir …`` with exit codes 0 ok / 1 any-FAIL / 2 connect
error / 3 unexpected (src/main.py:46-77, 219-228).

Graft: ``python -m engine.main --input DIR --output DIR [--checks …]
[--report all|html|csv|none] [--config-dir …] [--parts N] [--num-cpus N]``
running the checkpointed flagship pipeline + audit + reports. Exit codes:
0 all checks pass / 1 any FAIL / 2 input unreadable / 3 unexpected error.

This entry point owns its Ray session (guarded init + shutdown); library
code never does.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

logger = logging.getLogger("engine")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="engine.main",
                                description="Ray-Data quality-filter engine")
    sub = p.add_subparsers(dest="mode")

    q = sub.add_parser("quality", help="flagship corpus filter+scrub run")
    q.add_argument("--input", required=True, help="input corpus parquet dir")
    q.add_argument("--output", required=True, help="output dir (partitioned)")
    q.add_argument("--report", choices=["all", "html", "csv", "none"],
                   default="all")
    q.add_argument("--report-dir", default="reports")
    q.add_argument("--config-dir", default=None)
    q.add_argument("--parts", type=int, default=16,
                   help="checkpoint partitions (resume granularity)")
    q.add_argument("--overwrite", action="store_true",
                   help="wipe the output dir first instead of resuming")
    q.add_argument("--num-cpus", type=int, default=None)

    v = sub.add_parser("validate",
                       help="rule-driven checks over parquet tables "
                            "(reference run_validation parity)")
    v.add_argument("--tables", required=True, help="dir of {table}.parquet")
    v.add_argument("--checks", default=None,
                   help="comma list of count,null,duplicate,range,transform,masking")
    v.add_argument("--report", choices=["all", "html", "csv", "none"],
                   default="all")
    v.add_argument("--report-dir", default="reports")
    v.add_argument("--config-dir", default=None)
    v.add_argument("--num-cpus", type=int, default=None)

    argv = list(argv) if argv is not None else sys.argv[1:]
    if not argv or argv[0].startswith("-"):
        argv = ["quality"] + argv  # bare-flag compatibility
    return p.parse_args(argv)


def run_validate(args) -> int:
    """Reference run_validation parity over parquet tables."""
    import ray

    if not os.path.isdir(args.tables):
        logger.error("tables dir not found: %s", args.tables)
        return 2
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .report import CSVReporter, HTMLReporter
    from .rules import load_rules
    from .validate import run_validation

    rules = load_rules(args.config_dir)
    checks = args.checks.split(",") if args.checks else None
    results, summary = run_validation(args.tables, rules, checks)
    from datetime import datetime

    from .audit import write_results

    run_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    write_results(results, os.path.join(args.report_dir, "_audit"), run_id)
    for r in results:
        logger.info("[%s] %s -> %s (%d/%d)", r.rule_id, r.check_type,
                    r.status.value, r.violation_count, r.total_rows)
    logger.info("summary: %s", json.dumps(summary))
    if args.report in ("all", "csv"):
        logger.info("csv report: %s",
                    CSVReporter(args.report_dir).generate(results, summary))
    if args.report in ("all", "html"):
        logger.info("html report: %s",
                    HTMLReporter(args.report_dir).generate(results, summary))
    return 1 if summary["failed"] > 0 else 0


def run(args) -> int:
    import ray

    if args.mode == "validate":
        return run_validate(args)

    if not os.path.isdir(args.input):
        logger.error("input dir not found: %s", args.input)
        return 2

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import shutil

    from .audit import summarize
    from .checkpoint import run_checkpointed

    if getattr(args, "overwrite", False):
        shutil.rmtree(args.output, ignore_errors=True)
    from .pipelines.quality import audit_results
    from .report import CSVReporter, HTMLReporter
    from .rules import quality_thresholds

    thresholds = quality_thresholds(args.config_dir)
    summary_run = run_checkpointed(
        args.input, args.output, n_parts=args.parts, thresholds=thresholds,
        progress=lambda pid, m: logger.info(
            "partition %d committed: %d rows, %d kept (%.1fs)",
            pid, m["rows"], m["rows_kept"], m["wall_sec"]),
    )
    logger.info("run summary: %s", json.dumps(summary_run))

    # audit over the committed output (streaming read of small columns)
    import glob

    verdict_ds = ray.data.read_parquet(
        sorted(glob.glob(os.path.join(args.output, "part-*", "*.parquet")))
    )
    results = audit_results(verdict_ds, config_dir=args.config_dir)
    check_summary = summarize(results)
    logger.info("checks: %s", json.dumps(check_summary))

    # append to the audit history (S8 parity: dq_validation_results)
    from datetime import datetime

    from .audit import write_results

    run_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    audit_path = write_results(results, os.path.join(args.output, "_audit"), run_id)
    logger.info("audit history: %s", audit_path)

    if args.report in ("all", "csv"):
        path = CSVReporter(args.report_dir).generate(results, check_summary)
        logger.info("csv report: %s", path)
    if args.report in ("all", "html"):
        path = HTMLReporter(args.report_dir).generate(results, check_summary)
        logger.info("html report: %s", path)

    return 1 if check_summary["failed"] > 0 else 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = parse_args(argv)
    owns_session = False
    try:
        import ray

        owns_session = not ray.is_initialized()
        rc = run(args)
    except FileNotFoundError as e:
        logger.error("input error: %s", e)
        rc = 2
    except Exception:
        logger.exception("unexpected error")
        rc = 3
    finally:
        import ray

        if owns_session and ray.is_initialized():
            ray.shutdown()
    # machine-readable marker: `ray job submit` returns the Ray CLI's own
    # exit code, so remote wrappers recover the engine's 0/1/2/3 contract
    # from this line in the job log (scripts/run_pipeline.sh)
    print(f"ENGINE_EXIT_CODE={rc}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
