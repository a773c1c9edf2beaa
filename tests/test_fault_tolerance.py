"""Task-failure fault tolerance — the Spark analogue of the
reference's worker-churn test (distributed_test.go:39-73: kill workers
mid-job, assert the job still completes correctly).

Spark's TaskScheduler re-runs failed tasks up to spark.task.maxFailures
(session.py delegates fault tolerance to it, SURVEY.md §2.1 operator 8).
Local mode only retries with the ``local[N,maxFailures]`` master form,
which the shared test session doesn't use — so this test drives a
dedicated subprocess session and injects a deterministic first-attempt
task failure via TaskContext.attemptNumber().
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_SCRIPT = r"""
import os, sys
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4,2]")  # 2 task attempts
    .appName("smr-fault-injection")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, 1000, 1, 4)  # 4 partitions

def flaky(batches):
    from pyspark import TaskContext
    ctx = TaskContext.get()
    # Partition 0's FIRST attempt dies mid-task — the retried attempt
    # (and every other partition) completes normally.
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected worker failure (attempt 0)")
    for pdf in batches:
        pdf["doubled"] = pdf["id"] * 2
        yield pdf

out = df.mapInPandas(flaky, "id long, doubled long")
total = out.agg(F.sum("doubled").alias("s")).collect()[0]["s"]
n = out.count()
assert n == 1000, n
assert total == 2 * sum(range(1000)), total
print("FAULT-TOLERANCE-OK", n, total)
"""


def test_job_survives_injected_task_failure():
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FAULT-TOLERANCE-OK 1000 999000" in proc.stdout
    # the injected failure really happened (Spark logs the lost task)
    assert "injected worker failure" in proc.stderr


def test_job_fails_when_retries_exhausted():
    """With maxFailures=1 the same injection must kill the job — proving
    the retry path (not luck) is what saved the first test."""
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = _SCRIPT.replace("local[4,2]", "local[4,1]")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode != 0
    assert "injected worker failure" in (proc.stderr + proc.stdout)


def test_task_stats_surface(spark, sf_dir):
    """task_stats mirrors the reference's shutdown report: after a job
    runs, completed jobs/tasks are visible and nothing has failed."""
    from simplemapreduce_spark.session import task_stats

    from simplemapreduce_spark import catalog

    catalog.load_all()
    catalog.QUERIES["q_topk"](spark, sf_dir).collect()
    stats = task_stats(spark)
    assert stats["jobs"] >= 1
    assert stats["tasks_completed"] >= 1
    assert stats["tasks_failed"] == 0
    assert stats["parallelism"] >= 1
    assert isinstance(stats["executors"], list)


_CRASH_SCRIPT = r"""
import os, sys
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4,2]")
    .appName("smr-worker-crash")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, 1000, 1, 4)

def crashing(batches):
    from pyspark import TaskContext
    ctx = TaskContext.get()
    # Partition 0's first attempt KILLS ITS WORKER PROCESS outright
    # (no exception, no cleanup) — the closest local-mode analogue of
    # the reference's worker-churn test (distributed_test.go:52-73),
    # harsher than raising: Spark sees the socket die, not a Python
    # traceback.
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        os._exit(137)
    for pdf in batches:
        pdf["doubled"] = pdf["id"] * 2
        yield pdf

out = df.mapInPandas(crashing, "id long, doubled long")
total = out.agg(F.sum("doubled").alias("s")).collect()[0]["s"]
n = out.count()
assert n == 1000, n
assert total == 2 * sum(range(1000)), total
print("WORKER-CRASH-OK", n, total)
"""


def test_job_survives_worker_process_death():
    """A python worker process dying mid-task (os._exit, not an
    exception) must be absorbed by task retry — the process-loss form
    of fault tolerance the reference exercises by killing workers."""
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _CRASH_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WORKER-CRASH-OK 1000 999000" in proc.stdout
    # The injected crash must have actually fired (vacuity guard —
    # same pattern as the task-failure sibling): Spark logs the dead
    # worker socket before retrying.
    assert "Python worker exited unexpectedly" in proc.stderr


_EXECUTOR_LOSS_SCRIPT = r"""
import os, re, signal, subprocess, sys, threading, time

import pyspark
os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local-cluster[2,1,1024]")  # 2 executor JVMs
    .appName("smr-executor-loss")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)

df = spark.range(0, 800, 1, 8)  # 8 tasks over 2 single-core executors

def slow_double(batches):
    import time as _t
    _t.sleep(2.0)  # keep tasks in flight while the kill lands
    for pdf in batches:
        pdf["doubled"] = pdf["id"] * 2
        yield pdf

out = df.mapInPandas(slow_double, "id long, doubled long")

result = {}
def run_job():
    result["total"] = out.agg(F.sum("doubled").alias("s")).collect()[0]["s"]

t = threading.Thread(target=run_job)
t.start()

# Find a CoarseGrainedExecutorBackend JVM and SIGKILL it mid-job —
# true EXECUTOR loss (whole JVM with its task state and shuffle
# output), not just a python worker death. Match only java processes:
# this driver's own argv contains the class name too (the script text
# rides in `python -c`), and killing ourselves is not the test.
time.sleep(3.0)
pids = []
ps = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True, text=True)
for line in ps.stdout.splitlines():
    pid_s, _, args = line.strip().partition(" ")
    if "CoarseGrainedExecutorBackend" in args and "java" in args.split(" ", 1)[0]:
        pids.append(int(pid_s))
assert pids, "no executor JVMs found to kill"
os.kill(pids[0], signal.SIGKILL)
print("KILLED-EXECUTOR", pids[0], file=sys.stderr)

t.join(timeout=240)
assert not t.is_alive(), "job hung after executor loss"
assert result["total"] == 2 * sum(range(800)), result
print("EXECUTOR-LOSS-OK", result["total"])
spark.stop()
"""


def test_job_survives_executor_loss():
    """An entire executor JVM SIGKILLed mid-job (local-cluster mode:
    real separate executor processes) must be absorbed — the
    standalone master relaunches the executor and the TaskScheduler
    re-runs its lost tasks. This is the executor-grain form of the
    reference's worker-churn test (distributed_test.go:52-73), one
    level harsher than the python-worker death below: shuffle state
    and every running task on the JVM vanish at once."""
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _EXECUTOR_LOSS_SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    assert "EXECUTOR-LOSS-OK 639200" in proc.stdout
    # Vacuity guard: the kill must have actually fired and Spark must
    # have seen the executor drop.
    assert "KILLED-EXECUTOR" in proc.stderr
    assert re.search(r"Lost executor|ExecutorLostFailure|worker lost", proc.stderr, re.I), (
        proc.stderr[-3000:]
    )
