#!/usr/bin/env python
"""Streaming-state scale probe (VERDICT r10 item 7 — the ninth ladder
row): drive the stateful streaming family through two decades of EVENT
volume at FIXED key/window cardinality — the "same product, 100x the
traffic" regime — and record, per decade,

  * wall seconds to drain (expected ~linear in events: every event is
    touched once), and
  * the state store's high-water mark, max over every progress event of
    sum(stateOperators[*].numRowsTotal) (expected CONSTANT: one row per
    key for applyInPandasWithState, windows x 64 registers for the HLL,
    windows x bins for the quantile histogram).

A constant state row is the 100 TB argument for this family: executors
sized for today's state survive any event-rate growth, because nothing
in the state schema mentions event count. tests/
test_streaming_state_bounds.py pins the same bounds as hard assertions
at one scale; this probe MEASURES them across decades for SCALING.md.

Usage: python scripts/stream_state_probe.py [N] [case-substring ...]
(default N=100; cases: sessionize, locf, hll, binq). Events are
synthesized to /tmp (BASE=30k rows at 1x, N*BASE at Nx; 200 users over
a fixed 6 h span) — testdata stays untouched and read-only.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from bioeco_portal_etl_spark.session import get_spark  # noqa: E402
from bioeco_portal_etl_spark.streaming.locf import (  # noqa: E402
    streaming_locf_segments,
)
from bioeco_portal_etl_spark.streaming.sessions_stream import (  # noqa: E402
    streaming_sessionize,
)
from bioeco_portal_etl_spark.streaming.windows import (  # noqa: E402
    run_stream_to_memory,
    windowed_binned_quantiles,
    windowed_distinct_hll,
)

BASE = 30_000
N_USERS = 200
SPAN_S = 6 * 3600  # fixed 6 h of event time at every scale
EPOCH = 1_735_689_600  # 2025-01-01 00:00:00 UTC


def synth_events(spark, scale: int, out_dir: str) -> str:
    """scale*BASE events, 200 users, fixed 6 h span: per-user cadence
    shrinks with scale (rate grows), keys and windows do not. Each
    user's events compress into a 20-min burst at the top of every hour
    (40-min idle > the 30-min session gap), so sessionization closes 5
    sessions per user and keeps 1 open — at EVERY scale: output and
    state are scale-invariant, only event volume grows."""
    n = BASE * scale
    per_user = n // N_USERS
    path = f"{out_dir}/ev{scale}x"
    t_raw = (F.col("id") / N_USERS).cast("double") * (SPAN_S / per_user)
    hour = F.floor(t_raw / 3600)
    burst = (t_raw - hour * 3600) / 3.0  # squeeze the hour into 20 min
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(EPOCH)
                + hour * 3600
                + burst.cast("long")
                + (F.col("id") % N_USERS)  # <=199 s phase, gap stays >30 min
            ).alias("ts"),
            (F.col("id") % N_USERS).alias("user_id"),
            ((F.col("id") * 37 % 1009) / 100.0).alias("value"),
        )
        .repartition(max(4, scale))
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _stream(spark, path: str):
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .parquet(path)
        .withWatermark("ts", "10 minutes")
    )


def drain(stream_df, name: str) -> tuple[float, int, int]:
    """(wall seconds, max state rows over all progress, output rows)."""
    spark = stream_df.sparkSession
    t0 = time.perf_counter()
    q = run_stream_to_memory(stream_df, name, mode="append")
    try:
        ok = q.awaitTermination(1800)
        progress = list(q.recentProgress)
    finally:
        q.stop()
    wall = time.perf_counter() - t0
    if not ok:
        raise RuntimeError(f"{name} did not drain")
    mx = 0
    for p in progress:
        ops = p["stateOperators"] or []
        mx = max(mx, sum(int(o["numRowsTotal"]) for o in ops))
    return round(wall, 2), mx, spark.table(name).count()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    only = sys.argv[2:]
    spark = get_spark(app_name="stream-state-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    cases = {
        # applyInPandasWithState families: state = ONE row per user
        "sessionize": lambda p: streaming_sessionize(
            _stream(spark, p).select("user_id", "ts", "event_id"),
            gap_seconds=1800,
        ),
        "locf": lambda p: streaming_locf_segments(
            _stream(spark, p).select(
                "user_id",
                "ts",
                "event_id",
                F.floor(F.col("value") * 10000.0).cast("long").alias("vq"),
            )
        ),
        # engine-managed sketch aggregates: state = windows x registers/bins
        "hll": lambda p: windowed_distinct_hll(
            _stream(spark, p).select("ts", "user_id"), "1 hour", "user_id"
        ),
        "binq": lambda p: windowed_binned_quantiles(
            _stream(spark, p).select("ts", "value"),
            "1 hour",
            "value",
            bins=16,
            lo_cents=0,
            step_cents=100,
        ),
    }
    if only:
        cases = {k: v for k, v in cases.items() if any(s in k for s in only)}

    tmp = tempfile.mkdtemp(prefix="stream_state_probe_")
    results: dict[str, object] = {}
    try:
        # one unmeasured drain per case first: the very first streaming
        # query pays JVM/codegen/state-store-provider warm-up that would
        # otherwise inflate the 1x row (measured: 1x slower than 10x)
        path1 = synth_events(spark, 1, tmp)
        for name, mk in cases.items():
            drain(mk(path1), f"ssp_warm_{name}")
        for s in (1, n):
            path = path1 if s == 1 else synth_events(spark, s, tmp)
            for name, mk in cases.items():
                wall, state_hwm, rows = drain(mk(path), f"ssp_{name}_{s}x")
                results[f"{name}@{s}x"] = {
                    "sec": wall,
                    "state_rows_hwm": state_hwm,
                    "out_rows": rows,
                }
        for name in cases:
            a = results[f"{name}@1x"]
            b = results[f"{name}@{n}x"]
            results[f"{name}_time_ratio"] = round(
                b["sec"] / max(a["sec"], 1e-9), 1
            )
            results[f"{name}_state_ratio"] = round(
                b["state_rows_hwm"] / max(a["state_rows_hwm"], 1), 2
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"n": n, "base_events": BASE, "users": N_USERS,
                      "span_hours": SPAN_S // 3600, "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
