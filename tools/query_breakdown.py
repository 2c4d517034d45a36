"""Per-query executed-plan time breakdown (round-7 verdict ask #1).

The four `weak`-graded headliners (agg_pricing_summary,
join_star_revenue, asof_join, knn_cosine_brute) sit at 2.5-3.3x
floor-adjusted vs DuckDB at sf0.1 with already-minimal plan shapes.
This tool settles WHERE the residual goes, in-band: it runs each
headline query under the bench configuration (shuffle=8, AQE on, 1 MB
splits — the ONLY delta is ``spark.ui.enabled=true``, required for the
SQL REST API) and buckets the executed plan's node-level SQLMetrics
into scan / exchange / aggregate / codegen task-time sums.

Reading the output: metric sums are TASK time summed across all 32
local threads, so a 300 ms scan-time sum on a 0.25 s wall query means
the scan dominates the parallel work. ``wall_sf01`` is the min-of-5
steady wall; ``wall_floor`` is the same query's wall at sf0.001 (100x
less data — the per-query fixed cost); their difference is the
data-dependent work the floor-adjusted grade charges the engine for.

Usage: ``python tools/query_breakdown.py [out.json]`` (default
``BREAKDOWN_r08.json`` at the repo root).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_TIME_UNITS = {
    "ns": 1e-6,
    "us": 1e-3,
    "ms": 1.0,
    "s": 1000.0,
    "m": 60000.0,
    "min": 60000.0,
    "h": 3600000.0,
}

#: metric name -> breakdown bucket (names as the REST API reports them)
_BUCKETS = {
    "scan time": "scan_ms",
    "metadata time": "scan_ms",
    "shuffle write time": "exchange_ms",
    "fetch wait time": "exchange_ms",
    "remote reqs duration": "exchange_ms",
    "time in aggregation build": "agg_ms",
    "sort time": "sort_ms",
    "time to build hash map": "join_ms",
    "time to broadcast": "join_ms",
    "time to collect": "join_ms",
    "duration": "codegen_ms",  # WholeStageCodegen wall per task, summed
}


def _parse_total_ms(value: str) -> float | None:
    """REST metric values are display strings — 'total (min, med, max)'
    like ``'1.2 s (0 ms, 3 ms, 30 ms (stage 4.0: task 7))'`` — or a
    bare total. Returns the leading total in milliseconds, or None for
    non-time values (sizes, row counts)."""
    if "\n" in value:  # 'total (min, med, max …)\n<total> (<min>, …)'
        value = value.split("\n", 1)[1]
    head = value.split("(", 1)[0].strip().replace(",", "")
    m = re.match(r"^(-?\d+(?:\.\d+)?)\s*([a-z]+)$", head)
    if not m:
        return None
    num, unit = float(m.group(1)), m.group(2)
    if unit not in _TIME_UNITS:
        return None
    return num * _TIME_UNITS[unit]


def _get(url: str):
    with urllib.request.urlopen(url) as fh:
        return json.load(fh)


def _scan_task_distribution(ui: str, app: str, exec_entry: dict) -> dict:
    """Per-stage distribution of task input records for the execution —
    the direct evidence of scan parallelism (a single-row-group parquet
    file scans as ONE working task no matter how many splits exist)."""
    stage_ids: list[int] = []
    for jid in exec_entry.get("successJobIds", []):
        try:
            stage_ids += _get(f"{ui}/api/v1/applications/{app}/jobs/{jid}").get(
                "stageIds", []
            )
        except Exception:
            continue
    dist: dict[str, dict] = {}
    for sid in sorted(set(stage_ids)):
        try:
            tl = _get(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/0/taskList?length=1000"
            )
        except Exception:
            continue
        recs = sorted(
            (
                t.get("taskMetrics", {}).get("inputMetrics", {}).get("recordsRead", 0)
                for t in tl
            ),
            reverse=True,
        )
        if recs and sum(recs):
            dist[f"stage_{sid}"] = {
                "tasks": len(recs),
                "tasks_with_input": sum(1 for r in recs if r),
                "records_top4": recs[:4],
            }
    return dist


def breakdown_last_execution(spark) -> dict:
    """Bucketed node metric sums for the most recent SQL execution."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    data = _get(f"{ui}/api/v1/applications/{app}/sql?details=true&length=1000")
    last = max(data, key=lambda d: d["id"])
    out: dict = {k: 0.0 for k in set(_BUCKETS.values())}
    nodes = []
    for n in last.get("nodes", []):
        node_ms = {}
        for m in n.get("metrics", []):
            ms = _parse_total_ms(m.get("value", ""))
            if ms is None:
                continue
            bucket = _BUCKETS.get(m["name"].strip().lower())
            if bucket:
                out[bucket] += ms
            node_ms[m["name"]] = round(ms, 1)
        if node_ms:
            nodes.append({"node": n["nodeName"], "time_metrics_ms": node_ms})
    out = {k: round(v, 1) for k, v in out.items()}
    out["rest_duration_ms"] = last.get("duration")
    out["scan_task_distribution"] = _scan_task_distribution(ui, app, last)
    out["nodes"] = nodes
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BREAKDOWN_r08.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from pyspark.sql import SparkSession

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import DEFAULT_SF_DIR, configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("arnab_breakdown")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ["ARNAB_SPARK_DRIVER_MEM"])
        .config("spark.ui.enabled", "true")  # REST API source — only bench delta
        .config("spark.ui.retainedExecutions", "2000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("ARNAB_BENCH_SHUFFLE", "8"))
    spark.range(1000).selectExpr("sum(id)").collect()

    registry = all_queries()
    names = sorted(n for n, q in registry.items() if q.headline)
    sf_dir = DEFAULT_SF_DIR
    tiny_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    result = {
        "_comment": (
            "Executed-plan SQLMetric sums per headline query at sf0.1 "
            "under the bench config. Metric sums are task time summed "
            "across threads; wall_* are driver-side wall seconds. "
            "data_work_sec = wall_sf01 - wall_floor (the floor-adjusted "
            "grade's numerator)."
        ),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "queries": {},
    }
    for name in names:
        fn = registry[name].fn
        _noop(fn(spark, sf_dir))  # warm codegen/broadcast/session caches
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            _noop(fn(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        bd = breakdown_last_execution(spark)
        floor_walls = []
        if os.path.isdir(tiny_dir):
            _noop(fn(spark, tiny_dir))
            for _ in range(3):
                t0 = time.perf_counter()
                _noop(fn(spark, tiny_dir))
                floor_walls.append(time.perf_counter() - t0)
        entry = {
            "wall_sf01": round(min(walls), 4),
            "wall_floor": round(min(floor_walls), 4) if floor_walls else None,
            "data_work_sec": (
                round(min(walls) - min(floor_walls), 4) if floor_walls else None
            ),
        }
        entry.update({k: v for k, v in bd.items() if k != "nodes"})
        entry["nodes"] = bd["nodes"]
        entry["scan_task_distribution"] = bd.get("scan_task_distribution", {})
        result["queries"][name] = entry
        print(
            f"{name}: wall {entry['wall_sf01']}s floor {entry['wall_floor']}s "
            f"scan {entry['scan_ms']}ms agg {entry['agg_ms']}ms "
            f"exchange {entry['exchange_ms']}ms codegen {entry['codegen_ms']}ms",
            file=sys.stderr,
        )
    result["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(out_path)


if __name__ == "__main__":
    main()
