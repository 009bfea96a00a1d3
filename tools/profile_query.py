"""Per-query wall-time attribution for the bench queries (guide §1).

Splits the noop-sink wall of each query into:
  - construct_s : Python-side DataFrame construction (fn call; includes any
                  bounded probe actions the operator runs internally)
  - catalyst_ms : analysis/optimization/physical-planning phase times from
                  Spark's QueryPlanningTracker (driver, per action)
  - jobs        : number of Spark jobs the action launched
  - job_wall_s  : sum of job wall times (first-start -> last-end per job)
  - gap_s       : wall - job_wall - catalyst = driver dead time between jobs
                  (AQE re-planning, broadcast builds, py4j chatter)
plus stage/task counts from the status tracker.

Usage: python tools/profile_query.py q5_region_revenue dedup_exact ...
       (no args = a representative slice of the bench list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from iceberg_rust_spark.session import get_spark


def _parse_eventlog(evdir, app_id, windows):
    """windows: {name: [(t0_ms, t2_ms), ...]} wall windows per query rep.
    Returns {name: {...job/stage aggregates for the best rep window...}}."""
    import glob
    cands = (glob.glob(os.path.join(evdir, "eventlog_v2_" + app_id, "events_*"))
             or glob.glob(os.path.join(evdir, app_id + "*")))
    cands = [p for p in cands if not p.endswith(".zstd")] or cands
    if not cands:
        return {}
    path = cands[0]
    jobs = []        # (start_ms, end_ms)
    stages = []      # (submit_ms, complete_ms, ntasks)
    tasks = []       # (launch_ms, wall_ms, run_ms, cpu_ms, deser_ms, gc_ms)
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs.append([ev["Submission Time"], None, ev["Job ID"]])
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j[2] == ev["Job ID"]:
                        j[1] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub and com:
                    stages.append((sub, com, si.get("Number of Tasks", 0)))
            elif e == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                tasks.append((ti.get("Launch Time", 0),
                              ti.get("Finish Time", 0) - ti.get("Launch Time", 0),
                              tm.get("Executor Run Time", 0),
                              (tm.get("Executor CPU Time", 0)) // 1000000,
                              tm.get("Executor Deserialize Time", 0),
                              tm.get("JVM GC Time", 0)))
    out = {}
    for name, wins in windows.items():
        per = []
        for (w0, w2) in wins:
            jw = sum((j[1] - j[0]) / 1000.0 for j in jobs
                     if j[1] and w0 <= j[0] <= w2)
            nj = sum(1 for j in jobs if j[1] and w0 <= j[0] <= w2)
            ns = sum(1 for s in stages if w0 <= s[0] <= w2)
            nt = [t for t in tasks if w0 <= t[0] <= w2]
            per.append({"job_wall_s": round(jw, 3), "n_jobs": nj,
                        "n_stages": ns, "n_tasks": len(nt),
                        "task_wall_s": round(sum(t[1] for t in nt) / 1e3, 2),
                        "task_run_s": round(sum(t[2] for t in nt) / 1e3, 2),
                        "task_cpu_s": round(sum(t[3] for t in nt) / 1e3, 2),
                        "task_deser_s": round(sum(t[4] for t in nt) / 1e3, 2),
                        "task_gc_s": round(sum(t[5] for t in nt) / 1e3, 2)})
        out[name] = per
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    spark = get_spark("profile")
    sc = spark.sparkContext
    qs = entry.queries()
    names = sys.argv[1:] or [
        "q5_region_revenue", "q10_returned_items", "dedup_exact",
        "text_tfidf", "doc_pipeline", "iceberg_cdc_net",
        "iceberg_deleted_flag", "iceberg_q1_pricing", "doc_decontaminate",
        "doc_substring_dedup", "dedup_minhash", "multimodal_frames",
    ]

    entry._warehouse(spark, sf_dir)
    from iceberg_rust_spark.session import read_table as _rt
    for tbl in ("lineitem", "orders", "customer", "part", "supplier",
                "events", "documents", "embeddings"):
        _rt(spark, sf_dir, tbl).count()
    qs["iceberg_q1_pricing"](spark, sf_dir).count()
    qs["ann_lsh_topk"](spark, sf_dir).count()

    results = {}
    windows = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        wins = []
        for _ in range(3):
            w0 = int(time.time() * 1000)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            w2 = int(time.time() * 1000)
            wins.append((w0, w2))
            # catalyst phases for the write's execution
            try:
                jdf = df._jdf
                tr = jdf.queryExecution().tracker()
                phases = {}
                it = tr.phases().iterator()
                while it.hasNext():
                    kv = it.next()
                    ph = kv._2()
                    phases[str(kv._1())] = ph.endTimeMs() - ph.startTimeMs()
            except Exception as exc:
                phases = {"err": str(exc)[:80]}
            rec = {
                "wall_s": round(t2 - t0, 3),
                "construct_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "catalyst_ms": phases,
                "rep": len(wins) - 1,
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        results[name] = best
        windows[name] = wins
        print(name, json.dumps(best), flush=True)

    if evdir:
        app_id = sc.applicationId
        spark.stop()
        ev = _parse_eventlog(evdir, app_id, windows)
        for name, per in ev.items():
            b = results[name]
            jr = per[b["rep"]] if b["rep"] < len(per) else None
            if jr:
                b.update(jr)
                b["gap_s"] = round(b["exec_s"] - jr["job_wall_s"], 3)
            print("EV", name, json.dumps(b), flush=True)

    out = os.environ.get("PROFILE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
