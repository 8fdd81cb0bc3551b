#!/usr/bin/env python
"""Deterministic structure metric for optimization A/B: Spark job count,
stage count, and total task count per registry query (noop-sink run).
Wall time on this box is polluted by bursty virtualization-host
contention; job/stage/task counts are load-independent evidence that a
change removed work.

Run: python scripts/jobcount.py <name> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cassandra_pmem_spark.queries import all_queries
    from cassandra_pmem_spark.session import get_spark

    spark = get_spark("jobcount")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    registry = all_queries()
    registry["cql_point_lookup"][0](spark, sf_dir).collect()  # warm
    for name in names:
        group = f"jc_{name}"
        sc.setJobGroup(group, name)
        registry[name][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(group)
        stages = set()
        tasks = 0
        executed = 0
        for j in jobs:
            info = st.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = st.getStageInfo(s)
                if si is not None and s not in stages:
                    tasks += si.numTasks
                    # planned vs executed diverge when a job lists
                    # SKIPPED stages (lazy-checkpoint / cached parents):
                    # numTasks counts the plan, numCompletedTasks what ran
                    executed += si.numCompletedTasks
                stages.add(s)
        print(
            f"{name}: jobs={len(jobs)} stages={len(stages)} "
            f"tasks={tasks} executed={executed}",
            flush=True,
        )


if __name__ == "__main__":
    main()
