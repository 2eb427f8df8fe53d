"""Blockchain-domain queries for the driver correctness gate.

The harness tables have no chain data, so each query first derives a
deterministic synthetic chain FROM the events table — one signup tx
per distinct user plus one tx per event (purchase → CRC transfer,
view → non-CRC transfer, click → EOA eth transfer, signup → trust
event, error → unknown) — then runs the engine's REAL pipeline
(operators.classify → operators.extract → operators.views) on it.

The DuckDB oracle derives the EXPECTED outputs directly from events
(never simulating logs), so the classifier/extractor/view stack is
validated against an independent computation, not a SQL port of
itself.

Derivation contract (identical on both sides):
- addr(u)    = '0x' || %040x of (u+1)
- token(u)   = '0x' || %040x of (u+1 + 2^24)      (CRC tokens)
- nctoken(u) = '0x' || %040x of (u+1 + 2^25)      (non-CRC tokens)
- cents(v)   = CAST(round(v*100) AS BIGINT)        (exact: v is 2dp)
- signup tx of user u: block 12_529_458+u (Signup + self-Trust(100) +
  50e18 mint on token(u))
- event tx of event e: block 12_600_000 + e/10, index e%10
- trust event receiver: addr(user_id+13) — may not be a signed-up
  user, so the current-trust both-endpoints join has real negatives
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.classify import classify
from blockchain_indexer_spark.operators.extract import extract_all
from blockchain_indexer_spark.operators.views import (
    crc_all_signups,
    crc_balances_by_safe_and_token,
    crc_current_trust,
    crc_ledger,
)
from blockchain_indexer_spark.plans.registry import register
from blockchain_indexer_spark.schemas import (
    ADDRESS_EMPTY_BYTES_PREFIX,
    CRC_SIGNUP_MINT_WEI,
    CRC_SIGNUP_TOPIC,
    CRC_TRUST_TOPIC,
    EMPTY_ADDRESS,
    HUB_ADDRESS,
    LOG_STRUCT,
    TRANSFER_TOPIC,
)
from blockchain_indexer_spark.sources.parquet import load_table

MINT_HEX = "0x" + format(int(CRC_SIGNUP_MINT_WEI), "064x")
ADDR_SPACE, TOKEN_SPACE, NCTOKEN_SPACE = 1, 1 + 2**24, 1 + 2**25
SIGNUP_BLOCK_BASE, EVENT_BLOCK_BASE, EPOCH = 12_529_458, 12_600_000, 1_600_000_000


def _addr(offset: int, col):
    return F.concat(F.lit("0x"), F.format_string("%040x", col + F.lit(offset)))


def _topic(offset: int, col):
    return F.concat(F.lit(ADDRESS_EMPTY_BYTES_PREFIX), F.format_string("%040x", col + F.lit(offset)))


def _hex256(col):
    return F.concat(F.lit("0x"), F.format_string("%064x", col))


def _log(idx, address, topics, data):
    return F.struct(
        F.lit(idx).cast("int").alias("log_index"),
        address.alias("address"),
        topics.alias("topics"),
        data.alias("data"),
    )


def derive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → TX_WITH_LOGS rows (signup txs + one tx per event)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = F.col("user_id")

    users = ev.select("user_id").distinct()
    su = users.select(
        (F.lit(SIGNUP_BLOCK_BASE) + F.col("user_id")).alias("block_number"),
        F.concat(F.lit("0xb"), F.format_string("%063x", F.col("user_id"))).alias("block_hash"),
        F.concat(F.lit("0x"), F.md5(F.concat(F.lit("signup-"), F.col("user_id").cast("string")))).alias("hash"),
        F.lit(0).cast("int").alias("index"),
        _addr(ADDR_SPACE, F.col("user_id")).alias("from"),
        F.lit(HUB_ADDRESS).alias("to"),
        F.lit("0").alias("value"),
        F.lit("0x01").alias("input"),
        F.lit("1").alias("nonce"),
        F.lit("0").alias("type"),
        F.array(
            _log(
                0,
                F.lit(HUB_ADDRESS),
                F.array(F.lit(CRC_SIGNUP_TOPIC), _topic(ADDR_SPACE, F.col("user_id"))),
                _topic(TOKEN_SPACE, F.col("user_id")),
            ),
            _log(
                1,
                F.lit(HUB_ADDRESS),
                F.array(
                    F.lit(CRC_TRUST_TOPIC),
                    _topic(ADDR_SPACE, F.col("user_id")),
                    _topic(ADDR_SPACE, F.col("user_id")),
                ),
                _hex256(F.lit(100)),
            ),
            _log(
                2,
                _addr(TOKEN_SPACE, F.col("user_id")),
                F.array(
                    F.lit(TRANSFER_TOPIC),
                    F.lit(ADDRESS_EMPTY_BYTES_PREFIX + EMPTY_ADDRESS[2:]),
                    _topic(ADDR_SPACE, F.col("user_id")),
                ),
                F.lit(MINT_HEX),
            ),
        ).alias("logs"),
    )

    transfer_logs = lambda token_offset, to_offset: F.array(  # noqa: E731
        _log(
            0,
            _addr(token_offset, u),
            F.array(F.lit(TRANSFER_TOPIC), _topic(ADDR_SPACE, u), _topic(to_offset, u)),
            _hex256(cents),
        )
    )
    trust_logs = F.array(
        _log(
            0,
            F.lit(HUB_ADDRESS),
            F.array(F.lit(CRC_TRUST_TOPIC), _topic(ADDR_SPACE + 13, u), _topic(ADDR_SPACE, u)),
            _hex256(cents % 101),
        )
    )
    empty_logs = F.array().cast(f"array<{LOG_STRUCT.simpleString()}>")

    et = F.col("event_type")
    evtx = ev.select(
        (F.lit(EVENT_BLOCK_BASE) + (F.col("event_id") / 10).cast("long")).alias("block_number"),
        F.concat(
            F.lit("0xe"), F.format_string("%063x", (F.col("event_id") / 10).cast("long"))
        ).alias("block_hash"),
        F.concat(F.lit("0x"), F.md5(F.concat(F.lit("tx-"), F.col("event_id").cast("string")))).alias("hash"),
        (F.col("event_id") % 10).cast("int").alias("index"),
        _addr(ADDR_SPACE, u).alias("from"),
        F.when(et == "click", _addr(ADDR_SPACE + 1, u)).otherwise(_addr(ADDR_SPACE + 99, u)).alias("to"),
        F.when(et == "click", cents.cast("string")).otherwise(F.lit("0")).alias("value"),
        F.when(et == "click", F.lit("0x"))
        .when(et == "error", F.lit("0xdead"))
        .otherwise(F.lit("0x01"))
        .alias("input"),
        F.lit("1").alias("nonce"),
        F.lit("0").alias("type"),
        F.when(et == "purchase", transfer_logs(TOKEN_SPACE, ADDR_SPACE + 7))
        .when(et == "view", transfer_logs(NCTOKEN_SPACE, ADDR_SPACE + 3))
        .when(et == "signup", trust_logs)
        .otherwise(empty_logs)
        .alias("logs"),
    )

    chain = su.unionByName(evtx)
    return chain.withColumn(
        "timestamp", F.timestamp_seconds(F.lit(EPOCH) + F.col("block_number"))
    )


def _pipeline_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return extract_all(classify(derive_chain(spark, sf_dir)))


# Shared oracle derivation CTEs (DuckDB SQL)
_D = """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    ev AS (SELECT *, CAST(round(value*100) AS BIGINT) AS cents FROM events)
"""


@register(
    "chain_classification_counts",
    oracle=_D
    + """
    , labels AS (
        SELECT 'Erc20Transfer,CrcSignup,CrcTrust' AS label FROM users
        UNION ALL
        SELECT CASE event_type
                   WHEN 'purchase' THEN 'Erc20Transfer'
                   WHEN 'view' THEN 'Erc20Transfer'
                   WHEN 'click' THEN 'EoaEthTransfer'
                   WHEN 'signup' THEN 'CrcTrust'
                   ELSE 'Unknown' END
        FROM ev
    )
    SELECT label, COUNT(*) AS n FROM labels GROUP BY label
    """,
    doc="End-to-end classifier check: the derived chain runs through "
    "operators.classify; the oracle knows each tx's class by "
    "construction (C1-C8, TransactionClassifier.cs semantics).",
    survey_refs=("C1", "C2", "C5", "C7", "C8"),
)
def chain_classification_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    classified = classify(derive_chain(spark, sf_dir))
    return classified.groupBy(
        F.array_join("classification", ",").alias("label")
    ).agg(F.count("*").alias("n"))


@register(
    "chain_crc_balances",
    oracle=_D
    + """
    , ledger AS (
        SELECT '0x' || printf('%040x', user_id + 1) AS safe_address,
               '0x' || printf('%040x', user_id + 1 + 16777216) AS token,
               CAST('50000000000000000000' AS HUGEINT) AS v
        FROM users
        UNION ALL
        -- mint debit side: the reference ledger (0.0.64.sql:756-767)
        -- does NOT exclude the zero address, so each mint also books
        -- -50e18 against 0x000...0
        SELECT '0x0000000000000000000000000000000000000000',
               '0x' || printf('%040x', user_id + 1 + 16777216),
               -CAST('50000000000000000000' AS HUGEINT)
        FROM users
        UNION ALL
        SELECT '0x' || printf('%040x', user_id + 1),
               '0x' || printf('%040x', user_id + 1 + 16777216),
               -CAST(cents AS HUGEINT)
        FROM ev WHERE event_type = 'purchase'
        UNION ALL
        SELECT '0x' || printf('%040x', user_id + 8),
               '0x' || printf('%040x', user_id + 1 + 16777216),
               CAST(cents AS HUGEINT)
        FROM ev WHERE event_type = 'purchase'
    )
    SELECT safe_address, token, CAST(SUM(v) AS VARCHAR) AS balance
    FROM ledger GROUP BY safe_address, token
    """,
    doc="Full spine: derive → classify → extract erc20 → ledger "
    "(double-entry) → balances (0.0.64.sql:743-805); oracle computes "
    "balances directly from events. uint256 values compared as exact "
    "decimal strings.",
    survey_refs=("E1", "A1", "A3", "J1", "J3"),
)
def chain_crc_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _pipeline_tables(spark, sf_dir)
    ledger = crc_ledger(t["erc20_transfer"], t["crc_signup"])
    return crc_balances_by_safe_and_token(ledger).select(
        "safe_address", "token", F.col("balance").cast("string").alias("balance")
    )


@register(
    "chain_current_trust",
    oracle=_D
    + """
    , trust_events AS (
        -- self-trust from each signup tx
        SELECT '0x' || printf('%040x', user_id + 1) AS address,
               '0x' || printf('%040x', user_id + 1) AS can_send_to,
               CAST(100 AS BIGINT) AS "limit",
               12529458 + user_id AS block_number, 0 AS idx
        FROM users
        UNION ALL
        -- trust events from 'signup'-type events
        SELECT '0x' || printf('%040x', user_id + 1),
               '0x' || printf('%040x', user_id + 14),
               cents % 101,
               12600000 + event_id // 10, CAST(event_id % 10 AS INT)
        FROM ev WHERE event_type = 'signup'
    ), signed AS (SELECT '0x' || printf('%040x', user_id + 1) AS a FROM users)
    SELECT address AS "user", can_send_to, "limit"
    FROM (SELECT t.*, row_number() OVER (PARTITION BY t.address, t.can_send_to
                                         ORDER BY t.block_number DESC, t.idx DESC) AS rn
          FROM trust_events t
          JOIN signed sa ON t.address = sa.a
          JOIN signed sb ON t.can_send_to = sb.a)
    WHERE rn = 1
    """,
    doc="Latest-trust-per-pair through extract + crc_current_trust "
    "(0.0.64.sql:1074-1100): ranking window + double signup semi "
    "join; receiver addr(u+13) creates genuine not-signed-up drops.",
    survey_refs=("E4", "J4", "J9", "W1"),
)
def chain_current_trust(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _pipeline_tables(spark, sf_dir)
    signups = crc_all_signups(t["crc_signup"], t["crc_organisation_signup"])
    return crc_current_trust(t["crc_trust"], signups).select("user", "can_send_to", "limit")


@register(
    "chain_eth_transfer_stats",
    oracle=_D
    + """
    SELECT COUNT(*) AS n_transfers,
           CAST(SUM(cents) AS BIGINT) AS total_wei
    FROM ev WHERE event_type = 'click'
    """,
    doc="EOA eth-transfer extraction (C7/E6) aggregated; click events "
    "become value-bearing 0x-input zero-log txs.",
    survey_refs=("C7", "E6", "A5"),
)
def chain_eth_transfer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _pipeline_tables(spark, sf_dir)
    return t["eth_transfer"].agg(
        F.count("*").alias("n_transfers"),
        F.sum("value").cast("bigint").alias("total_wei"),
    )
