"""Canonical test fixtures per FIXTURES.md (reference
feathub_it_test_base.py:250-294): the 6-row purchases table F1 and the
point-in-time join right table F2."""

import os

from feathub_spark import FileSystemSource, Int64, Float64, Schema, String

F1_ROWS = [
    ("Alex", 100, 100, "2022-01-01 08:01:00"),
    ("Emma", 400, 250, "2022-01-01 08:02:00"),
    ("Alex", 300, 200, "2022-01-02 08:03:00"),
    ("Emma", 200, 250, "2022-01-02 08:04:00"),
    ("Jack", 500, 500, "2022-01-03 08:05:00"),
    ("Alex", 600, 800, "2022-01-03 08:06:00"),
]

F2_ROWS = [
    ("Alex", 100.0, "2022-01-01,09:01:00"),
    ("Emma", 400.0, "2022-01-01,09:02:00"),
    ("Alex", 200.0, "2022-01-02,07:03:00"),
    ("Emma", 300.0, "2022-01-02,09:04:00"),
    ("Jack", 500.0, "2022-01-03,09:05:00"),
    ("Alex", 450.0, "2022-01-03,09:06:00"),
]


def write_f1_source(tmpdir, name="purchases") -> FileSystemSource:
    path = os.path.join(str(tmpdir), f"{name}.csv")
    with open(path, "w") as f:
        f.write("name,cost,distance,time\n")
        for r in F1_ROWS:
            f.write(",".join(str(x) for x in r) + "\n")
    schema = (
        Schema.new_builder()
        .column("name", String)
        .column("cost", Int64)
        .column("distance", Int64)
        .column("time", String)
        .build()
    )
    return FileSystemSource(
        name=name,
        path=path,
        data_format="csv",
        schema=schema,
        keys=["name"],
        timestamp_field="time",
        timestamp_format="%Y-%m-%d %H:%M:%S",
    )


def write_f2_source(tmpdir, name="avg_costs") -> FileSystemSource:
    path = os.path.join(str(tmpdir), f"{name}.csv")
    with open(path, "w") as f:
        f.write("name,avg_cost,time\n")
        for r in F2_ROWS:
            f.write(",".join(f'"{x}"' if isinstance(x, str) else str(x) for x in r) + "\n")
    schema = (
        Schema.new_builder()
        .column("name", String)
        .column("avg_cost", Float64)
        .column("time", String)
        .build()
    )
    return FileSystemSource(
        name=name,
        path=path,
        data_format="csv",
        schema=schema,
        keys=["name"],
        timestamp_field="time",
        timestamp_format="%Y-%m-%d,%H:%M:%S",
    )
