"""Regression: the driver contract must work when the harness process
launches from OUTSIDE /root/repo.

Local-mode executor Python workers inherit the driver's cwd, not its
``sys.path`` — so a pandas-UDF operator whose function pickles package
references dies with ModuleNotFoundError unless the package archive is
shipped via ``addPyFile`` (``ensure_package_shipped``). This runs a
Python-worker-dependent key end-to-end from a foreign cwd in a
subprocess; pure-Catalyst keys would pass even without the fix, so the
key choice (a pandas UDF) is load-bearing.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .appName("foreign-cwd")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as contract
df = contract.queries()["ext_entropy"](spark, "/root/testdata/sf0.001")
n = df.count()
assert n > 0, n
print("FOREIGN_CWD_OK", n)
spark.stop()
"""


def test_pandas_udf_key_runs_from_foreign_cwd(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the harness may not set one
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FOREIGN_CWD_OK" in proc.stdout
