"""LIVE Prometheus-push integration test — the no-docker closure for
PrometheusSink: an in-process HTTP pushgateway (stdlib http.server)
receives the REAL wire push — method, path, content type, and text
exposition body — from the production foreachPartition path
(source_sink_utils._write_prometheus), with the prometheus_client API
shim (tests/_shims/prometheus_client.py) injected driver-side and
shipped to executors via addPyFile.  Same pattern as the Derby JDBC,
RESP2 Redis, and embedded-metastore Hive closures.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from feathub_spark.feature_tables.sinks.connector_sinks import PrometheusSink
from feathub_spark.processors.spark.source_sink_utils import insert_into_sink

_SHIM_PATH = os.path.join(
    os.path.dirname(__file__), "_shims", "prometheus_client.py"
)


class _Gateway:
    """Records every request; replies 200."""

    def __init__(self) -> None:
        self.requests: list = []
        gw = self

        class Handler(BaseHTTPRequestHandler):
            def _record(self) -> None:
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length)
                gw.requests.append(
                    {
                        "method": self.command,
                        "path": self.path,
                        "content_type": self.headers.get("Content-Type"),
                        "body": body.decode("utf-8"),
                    }
                )
                self.send_response(200)
                self.end_headers()

            do_PUT = do_POST = do_DELETE = _record

            def log_message(self, *a):  # keep pytest output clean
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.host, self.port = self._server.server_address

    def start(self) -> "_Gateway":
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


@pytest.fixture()
def gateway():
    gw = _Gateway().start()
    yield gw
    gw.stop()


@pytest.fixture()
def prom_shim(monkeypatch):
    spec = importlib.util.spec_from_file_location("prometheus_client", _SHIM_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setitem(sys.modules, "prometheus_client", mod)
    yield mod


def test_sink_pushes_one_metric_group_live(spark, gateway, prom_shim):
    """The executor-side push arrives as ONE PUT per job with the latest
    row's numeric columns as gauges in valid text exposition format."""
    spark.sparkContext.addPyFile(_SHIM_PATH)
    df = spark.createDataFrame(
        [("a", 1, 0.25), ("b", 7, 0.5)], "name string, cnt long, ratio double"
    )
    sink = PrometheusSink(
        host_url=f"http://{gateway.host}:{gateway.port}", job_name="feathub_it"
    )
    insert_into_sink(df, sink, None)

    assert len(gateway.requests) == 1  # repartition(1): one group, no stale shards
    req = gateway.requests[0]
    assert req["method"] == "PUT"
    assert req["path"] == "/metrics/job/feathub_it"
    assert req["content_type"].startswith("text/plain; version=0.0.4")
    lines = req["body"].splitlines()
    # deterministic last-row-wins: total sort puts ("b", 7, 0.5) last
    assert "# TYPE cnt gauge" in lines
    assert "cnt 7.0" in lines
    assert "ratio 0.5" in lines
    # string columns never become gauges
    assert not any(ln.startswith("name") for ln in lines)


def test_empty_frame_pushes_nothing(spark, gateway, prom_shim):
    spark.sparkContext.addPyFile(_SHIM_PATH)
    df = spark.createDataFrame([], "cnt long")
    sink = PrometheusSink(
        host_url=f"http://{gateway.host}:{gateway.port}", job_name="noop_job"
    )
    insert_into_sink(df, sink, None)
    assert gateway.requests == []
