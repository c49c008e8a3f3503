"""CLI runner: the bert-runner.py analog (reference bert/runner/factory.py).

    python -m bert_etl_spark list
    python -m bert_etl_spark run <query> [--sf-dir DIR] [--limit N] [--explain]
    python -m bert_etl_spark entry

A user of the reference drives pipelines with `bert-runner.py -m <module>`;
here every registered operator is runnable by name against any data dir.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="bert_etl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a registered query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--explain", action="store_true", help="print the physical plan")

    sub.add_parser("entry", help="run the flagship entry query")

    args = parser.parse_args(argv)

    from bert_etl_spark.operators import registry

    registry.load_all()

    if args.cmd == "list":
        for name in sorted(registry.ALL_QUERIES):
            oracle = "oracle" if name in registry.ALL_ORACLES else "rows-only"
            print(f"{name}  [{oracle}]")
        return 0

    from bert_etl_spark.session import get_spark

    spark = get_spark(app_name="bert_etl_spark_cli")
    if args.cmd == "entry":
        import __spark_entry__ as entry_mod

        entry_mod.entry(spark).show(25, truncate=False)
        return 0

    if args.query not in registry.ALL_QUERIES:
        print(f"unknown query: {args.query} (see `python -m bert_etl_spark list`)",
              file=sys.stderr)
        return 2
    df = registry.ALL_QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
