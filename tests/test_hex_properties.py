"""hex_to_decimal edge behavior: exact agreement with Python int(h,16)
across the uint256 range, including the decimal(38,0) overflow-to-null
policy (SURVEY §1.2 — the #1 custom-types hazard)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.hex import hex_to_decimal, strip_topic_address

DEC38_MAX = 10**38


def expected(h: str | None):
    if h is None:
        return None
    v = int(h, 16) if h not in ("0x", "") else 0
    return v if v < DEC38_MAX and v < 2**128 else None


EDGES = [
    "0x0",
    "0x",
    "0x1",
    "0x" + "0" * 63 + "1",                      # full-width 1
    hex(2**64 - 1),                              # one-limb max
    hex(2**64),                                  # limb boundary
    hex(2**127 - 1),
    hex(10**38 - 1),                             # decimal(38,0) max
    hex(10**38),                                 # overflow → null
    hex(2**128 - 1),                             # 32 hex chars, > 1e38 → null
    hex(2**128),                                 # 33 hex chars → null
    hex(2**256 - 1),                             # uint256 max → null
    "0x" + "0" * 20 + hex(12345)[2:],            # leading zeros
    "0XAB",                                      # upper-case prefix digits
    "0xAbCdEf",
]


def test_hex_to_decimal_exact(spark):
    rng = random.Random(42)
    values = EDGES + [hex(rng.randrange(0, 2**256)) for _ in range(200)] + [
        hex(rng.randrange(0, 10**38)) for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in values], "h string")
    got = df.select("h", hex_to_decimal(F.col("h")).alias("d")).collect()
    for r in got:
        exp = expected(r["h"])
        actual = None if r["d"] is None else int(r["d"])
        assert actual == exp, f"{r['h']}: got {actual}, want {exp}"


def test_hex_to_decimal_null_in_null_out(spark):
    df = spark.createDataFrame([(None,)], "h string")
    assert df.select(hex_to_decimal(F.col("h")).alias("d")).collect()[0]["d"] is None


def test_strip_topic_address_only_strips_prefix(spark):
    rows = [
        ("0x000000000000000000000000" + "ab" * 20, "0x" + "ab" * 20),
        # prefix occurring NOT at the start must not be stripped
        ("0xff000000000000000000000000" + "ab" * 19, "0xff000000000000000000000000" + "ab" * 19),
        ("0x", "0x"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "t string")
    got = [r["s"] for r in df.select(strip_topic_address(F.col("t")).alias("s")).collect()]
    assert got == [want for _, want in rows]
