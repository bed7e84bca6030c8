"""LIVE Hive integration test — the no-docker closure for the Hive
connector pair: the pyspark wheel ships the Hive catalog jars, so
``enableHiveSupport()`` with an embedded Derby metastore runs a REAL
metastore in-process (same pattern as test_jdbc_derby_live.py for JDBC
and test_redis_live.py for Redis).

Spark fixes spark.sql.catalogImplementation at first-session creation per
JVM and the shared pytest session is hive-less, so the body runs in a
subprocess (tests/hive_live_script.py) driving the production
insert_into_sink/get_source_dataframe paths; this wrapper asserts its
machine-checkable marker.
"""

import os
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(__file__), "hive_live_script.py")


def test_hive_sink_source_roundtrip_live():
    proc = subprocess.run(
        [sys.executable, _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "HIVE_LIVE_OK rows=3" in proc.stdout
