"""Per-component attribution of the streaming_lsh_ledger registered query.

Runs the 3-epoch registered run once in THIS JVM with
spark.bert_etl.lshLedger.timing=true and prints end-to-end seconds plus
the per-epoch component breakdown recorded by the foreachBatch lane
(recovery glob, bucket marker, epoch glob, compaction trigger, touched-
bucket collect, probe path enumeration, re-delivery take, pairs write,
ledger write). Run it 3x in fresh JVMs and take the min — warm reruns
measure the block cache, not the machinery.

Usage: python tools/ledger_attribution.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bert_etl_spark.operators import registry
from bert_etl_spark.session import get_spark
from bert_etl_spark.streaming import events


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.conf.set(events.LEDGER_TIMING_CONF, "true")
    registry.load_all()
    events.LEDGER_TIMINGS.clear()
    t0 = time.perf_counter()
    n = registry.ALL_QUERIES["streaming_lsh_ledger"](spark, sf_dir).count()
    total = time.perf_counter() - t0
    comp: dict[str, float] = {}
    for tm in events.LEDGER_TIMINGS:
        for k, v in tm.items():
            if k != "epoch":
                comp[k] = comp.get(k, 0.0) + v
    accounted = sum(comp.values())
    print(json.dumps({
        "sf_dir": sf_dir,
        "rows": n,
        "total_sec": round(total, 3),
        "components_sec": {k: round(v, 3) for k, v in sorted(comp.items())},
        "accounted_sec": round(accounted, 3),
        "unaccounted_sec": round(total - accounted, 3),
        "epochs": [
            {k: (v if k == "epoch" else round(v, 3)) for k, v in tm.items()}
            for tm in events.LEDGER_TIMINGS
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
