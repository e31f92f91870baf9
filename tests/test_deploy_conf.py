"""Smoke-test the cluster deploy profile (VERDICT r5 next-steps #7).

`deploy/spark-defaults-cluster.conf` shipped in r5 untested — a typo'd
key or a value Spark rejects would only surface on a real cluster. This
boots a REAL local session with the profile's query-shaping settings
applied (everything except cluster-topology keys that need YARN/K8s or
an external shuffle service) and runs three representative queries
through it, so the profile cannot bit-rot.

Runs in a subprocess: the test session's SparkContext is
process-global, and the profile must be applied at session build time.
"""

import subprocess
import sys
from pathlib import Path

CONF = Path(__file__).resolve().parent.parent / "deploy" / "spark-defaults-cluster.conf"

# Keys that only make sense with a cluster manager / external shuffle
# service / history server; everything else must be locally bootable.
_CLUSTER_ONLY_PREFIXES = (
    "spark.executor.instances",
    "spark.executor.cores",
    "spark.executor.memory",
    "spark.executor.memoryOverhead",
    "spark.driver.memory",
    "spark.driver.maxResultSize",
    "spark.decommission.",
    "spark.storage.decommission.",
    "spark.shuffle.service.",
    "spark.dynamicAllocation.",
    "spark.eventLog.",
    "spark.ui.",
)


def parse_conf(path: Path) -> dict[str, str]:
    out = {}
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        key, _, val = line.partition(" ")
        out[key.strip()] = val.strip()
    assert out, "profile parsed empty"
    return out


def test_conf_parses_and_covers_the_sizing_knobs():
    conf = parse_conf(CONF)
    # The three sizing knobs the header says scale together, plus the
    # plan-shaping settings every registered query's audit assumes.
    for key in (
        "spark.executor.instances",
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.executorEnv.OMP_NUM_THREADS",
    ):
        assert key in conf, key
    assert conf["spark.sql.adaptive.enabled"] == "true"
    # 2-3x total cores rule stated in the profile comment.
    cores = int(conf["spark.executor.instances"]) * int(
        conf["spark.executor.cores"]
    )
    assert 2 * cores <= int(conf["spark.sql.shuffle.partitions"]) <= 4 * cores


_DRIVE = r"""
import sys
sys.path.insert(0, "/root/repo")
from tests.test_deploy_conf import CONF, parse_conf, _CLUSTER_ONLY_PREFIXES

from pyspark.sql import SparkSession

conf = parse_conf(CONF)
b = (
    SparkSession.builder.master("local[8]")
    .appName("deploy-conf-smoke")
)
applied = 0
for k, v in conf.items():
    if any(k.startswith(p) for p in _CLUSTER_ONLY_PREFIXES):
        continue
    b = b.config(k, v)
    applied += 1
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert applied >= 15, applied
# The cluster-shaped settings must actually be in effect.
assert spark.conf.get("spark.sql.shuffle.partitions") == conf["spark.sql.shuffle.partitions"]
assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

# Three representative queries straight from the registry: a scan
# (pushdown path), a shuffle agg + broadcast join (TPC-H shape), and a
# Pandas-UDF kernel fan-out (Arrow boundary) — at 16384 shuffle
# partitions AQE must coalesce these, proving the profile doesn't choke
# small stages either.
from polars_mas_spark import queries as q
from polars_mas_spark import queries_ext as qe

sf = "/root/testdata/sf0.001"
n1 = q.QUERIES["scan_project"](spark, sf).count()
n2 = q.QUERIES["tpch_q3"](spark, sf).count()
n3 = qe.q_mas_logistic_fanout(spark, sf).count()
assert n1 > 0 and n2 > 0 and n3 > 0, (n1, n2, n3)
print("DEPLOY_CONF_SMOKE_OK", applied, n1, n2, n3)
spark.stop()
"""


def test_profile_boots_and_runs_queries():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVE],
        capture_output=True,
        text=True,
        # A fresh 16384-shuffle-partition session + three queries takes
        # ~230 s on an IDLE box; under background load the 420 s limit
        # this started with flaked (r7). Generous ceiling — the test is
        # about booting the profile at all, not about speed.
        timeout=900,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "DEPLOY_CONF_SMOKE_OK" in proc.stdout, proc.stdout[-2000:]
