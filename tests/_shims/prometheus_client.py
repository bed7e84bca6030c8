"""prometheus_client-compatible TEST SHIM with a real HTTP push path.

NOT the prometheus_client package: a minimal implementation of the API
subset feathub_spark's PrometheusSink uses — ``CollectorRegistry``,
``Gauge(name, doc, registry=...)`` / ``.set()``, ``push_to_gateway`` —
whose push performs the REAL wire operation: an HTTP PUT to
``{gateway}/metrics/job/{job}`` with the body in the Prometheus text
exposition format (public spec,
prometheus.io/docs/instrumenting/exposition_formats/) and the version
0.0.4 content type, exactly what a Pushgateway ingests.  Used by
tests/test_prometheus_live.py against an in-process gateway so the
production foreachPartition push runs live (injected driver-side,
shipped to executors with addPyFile).
"""

from __future__ import annotations

import urllib.request

CONTENT_TYPE_LATEST = "text/plain; version=0.0.4; charset=utf-8"


class CollectorRegistry:
    def __init__(self) -> None:
        self._collectors: list = []

    def register(self, collector) -> None:
        if any(c.name == collector.name for c in self._collectors):
            raise ValueError(f"Duplicated timeseries {collector.name!r}")
        self._collectors.append(collector)

    def expose(self) -> bytes:
        out = []
        for c in self._collectors:
            out.append(f"# HELP {c.name} {c.documentation}\n")
            out.append(f"# TYPE {c.name} gauge\n")
            out.append(f"{c.name} {format_float(c.value)}\n")
        return "".join(out).encode("utf-8")


def format_float(v) -> str:
    # Prometheus text format renders values as Go-style floats; repr of a
    # python float is accepted (1, 1.5, 1e+20 all parse)
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return f"{int(f)}.0"
    return repr(f)


class Gauge:
    def __init__(
        self, name: str, documentation: str, labelnames=(), registry=None
    ) -> None:
        if labelnames:
            raise NotImplementedError("shim supports unlabelled gauges only")
        self.name = name
        self.documentation = documentation
        self.value = 0.0
        if registry is not None:
            registry.register(self)

    def set(self, value) -> None:
        self.value = float(value)

    def inc(self, amount: float = 1.0) -> None:
        self.value += amount


def _url(gateway: str, job: str) -> str:
    base = gateway if "://" in gateway else f"http://{gateway}"
    return f"{base.rstrip('/')}/metrics/job/{job}"


def push_to_gateway(gateway: str, job: str, registry, timeout: float = 30) -> None:
    """PUT replaces the job's whole metric group (pushadd_to_gateway would
    POST) — the same method the real client uses."""
    req = urllib.request.Request(
        _url(gateway, job),
        data=registry.expose(),
        method="PUT",
        headers={"Content-Type": CONTENT_TYPE_LATEST},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status >= 400:  # pragma: no cover - urlopen raises first
            raise OSError(f"push failed: {resp.status}")


def pushadd_to_gateway(gateway: str, job: str, registry, timeout: float = 30) -> None:
    req = urllib.request.Request(
        _url(gateway, job),
        data=registry.expose(),
        method="POST",
        headers={"Content-Type": CONTENT_TYPE_LATEST},
    )
    urllib.request.urlopen(req, timeout=timeout).close()


def delete_from_gateway(gateway: str, job: str, timeout: float = 30) -> None:
    req = urllib.request.Request(_url(gateway, job), method="DELETE")
    urllib.request.urlopen(req, timeout=timeout).close()
