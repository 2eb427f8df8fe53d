"""Detail extraction — `DetailExtractors/*DetailExtractor.cs` as
DataFrame transforms: a classified transaction yields 0..N typed event
rows (`README.md:65-66`), one output DataFrame per event class.

Design: `assemble_transactions` builds the classify/extract input once
(tx ⋈ block timestamp, logs collected per tx); each extractor is a
filter + explode/projection over that — no additional shuffles beyond
the one logs-groupBy, and every extractor shares the same scan.

uint256 note: event `value` columns carry DecimalType(38,0) plus a
lossless `value_string` (decimal string when in range, original hex
otherwise — divergence from the reference's unbounded numeric is
documented in schemas.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.hex import hex_to_decimal
from blockchain_indexer_spark.operators.classify import (
    parsed_crc_trust_p,
    parsed_erc20_transfer_p,
    parsed_org_signup_p,
)
from blockchain_indexer_spark.schemas import (
    CLASS_CRC_HUB_TRANSFER,
    CLASS_CRC_ORGANISATION_SIGNUP,
    CLASS_CRC_SIGNUP,
    CLASS_CRC_TRUST,
    CLASS_EOA_ETH_TRANSFER,
    CLASS_ERC20_TRANSFER,
    CLASS_SAFE_ETH_TRANSFER,
    HUB_ADDRESS,
)

_COMMON = ["block_number", "timestamp", "hash", "index"]


def assemble_transactions(
    blocks: DataFrame, transactions: DataFrame, logs: DataFrame
) -> DataFrame:
    """raw blocks + transactions + logs → TX_WITH_LOGS rows.

    Logs are collected per tx ordered by log_index (sort_array on the
    struct orders by its first field). Transactions without logs get
    an empty array. Shuffles: one groupBy(tx_hash) for the logs, one
    join on block identity — both keyed on high-cardinality columns.
    """
    log_structs = logs.groupBy("tx_hash").agg(
        F.sort_array(
            F.collect_list(F.struct("log_index", "address", "topics", "data"))
        ).alias("logs")
    )
    b = blocks.select(
        F.col("number").alias("block_number"),
        F.col("hash").alias("block_hash"),
        F.timestamp_seconds("timestamp").alias("timestamp"),
    )
    empty_logs = F.array().cast(log_structs.schema["logs"].dataType)
    return (
        transactions.join(b, ["block_number", "block_hash"])
        .join(log_structs, transactions["hash"] == log_structs["tx_hash"], "left")
        .drop("tx_hash")
        .withColumn("logs", F.coalesce(F.col("logs"), empty_logs))
    )


def _value_cols(value_hex: Column) -> list[Column]:
    dec = hex_to_decimal(value_hex)
    return [
        dec.alias("value"),
        F.coalesce(dec.cast("string"), value_hex).alias("value_string"),
    ]


def extract_erc20_transfers(classified: DataFrame) -> DataFrame:
    """One row per valid Transfer log (Erc20TransferDetailExtractor.cs:
    11-46 — iterates Transfer-topic logs, skips malformed ones).

    Reads the parsed-log structs (`_lp`) classify already built, so the
    topic strip and hex decode are not re-derived here.
    """
    # `& data IS NOT NULL`: the reference skips a topic-valid Transfer
    # log whose value failed to parse (`value == null` continue,
    # Erc20TransferDetailExtractor.cs:34-37). Only the RAW data being
    # NULL counts — a >=1e38 value is non-null there (BigInteger never
    # overflows) and keeps its row under this engine's documented
    # overflow-to-NULL-decimal policy (value_string preserves the hex).
    exploded = classified.filter(F.col(f"is_{CLASS_ERC20_TRANSFER}")).select(
        *_COMMON,
        F.explode(
            F.filter(
                F.col("_lp"),
                lambda l: parsed_erc20_transfer_p(l) & l["data"].isNotNull(),
            )
        ).alias("log"),
    )
    return exploded.select(
        *_COMMON,
        F.col("log")["t1"].alias("from"),
        F.col("log")["t2"].alias("to"),
        F.col("log")["address"].alias("token"),
        F.col("log")["data_dec"].alias("value"),
        F.coalesce(F.col("log")["data_dec"].cast("string"), F.col("log")["data"]).alias(
            "value_string"
        ),
    )


def extract_crc_trusts(classified: DataFrame, hub: str = HUB_ADDRESS) -> DataFrame:
    """FIRST Trust-topic log only (CrcTrustDetailExtractor.cs:12-42
    uses FirstOrDefault on the topic), emitted when fully valid."""
    first = F.get(F.filter(F.col("_lp"), lambda l: l["has_trust"]), 0)
    return (
        classified.filter(F.col(f"is_{CLASS_CRC_TRUST}"))
        .withColumn("_t", first)
        .filter(parsed_crc_trust_p(F.col("_t"), hub))
        .select(
            *_COMMON,
            F.col("_t")["t2"].alias("address"),
            F.col("_t")["t1"].alias("can_send_to"),
            F.col("_t")["data_dec"].cast("long").alias("limit"),
        )
    )


def extract_crc_signups(
    classified: DataFrame, safe_owners: DataFrame | None = None
) -> DataFrame:
    """(user, token) from the signup classification
    (CrcSignupDetailExtractor.cs:11-25) + owners enrichment — the
    reference resolves owners via a getOwners eth_call per signup
    (Indexer.cs:404-439); here owners come from an injectable
    side-input DataFrame (safe_address, owners) so tests stub the RPC.
    Owners are lowercased like Indexer.cs:416,433.
    """
    out = classified.filter(F.col(f"is_{CLASS_CRC_SIGNUP}")).select(
        *_COMMON,
        F.col("_signup_user").alias("user"),
        F.col("_signup_token").alias("token"),
    )
    if safe_owners is None:
        return out.withColumn("owners", F.lit(None).cast("array<string>"))
    so = safe_owners.select(
        F.col("safe_address"),
        F.transform(F.col("owners"), F.lower).alias("owners"),
    )
    return out.join(
        F.broadcast(so), out["user"] == so["safe_address"], "left"
    ).drop("safe_address")


def extract_crc_organisation_signups(
    classified: DataFrame, hub: str = HUB_ADDRESS
) -> DataFrame:
    """FIRST OrgSignup-TOPIC log, emitted only when valid
    (CrcOrganisationSignupDetailExtractor.cs:14-30: FirstOrDefault on
    the topic, THEN IsCrcOrganisationSignup validates it — an invalid
    first log throws, so no row; taking the first VALID log would emit
    rows the reference never produces. Same pattern as
    extract_crc_trusts)."""
    first = F.get(F.filter(F.col("_lp"), lambda l: l["has_org"]), 0)
    return (
        classified.filter(F.col(f"is_{CLASS_CRC_ORGANISATION_SIGNUP}"))
        .withColumn("_o", first)
        .filter(parsed_org_signup_p(F.col("_o"), hub))
        .select(
            *_COMMON,
            F.col("_o")["t1"].alias("organisation"),
        )
    )


def extract_crc_hub_transfers(classified: DataFrame) -> DataFrame:
    """(from, to, value) of the single HubTransfer log
    (CrcHubTransferDetailExtractor.cs:10-31; :18-21 throws when from,
    to or amount is missing — no row here, matching that)."""
    return classified.filter(
        F.col(f"is_{CLASS_CRC_HUB_TRANSFER}")
        & F.col("_hub_from").isNotNull()
        & F.col("_hub_to").isNotNull()
        & F.col("_hub_value_hex").isNotNull()
    ).select(
        *_COMMON,
        F.col("_hub_from").alias("from"),
        F.col("_hub_to").alias("to"),
        *_value_cols(F.col("_hub_value_hex")),
    )


def extract_eth_transfers(classified: DataFrame) -> DataFrame:
    """Plain EOA transfer from tx fields (EthTransferDetailExtractor
    .cs:9-18 — addresses NOT lowercased there, preserved as-is)."""
    # try_cast: schemas.py's uint256 policy is overflow-to-NULL, and a
    # malformed wei string must not ANSI-abort the batch
    dec = F.col("value").try_cast("decimal(38,0)")
    return classified.filter(F.col(f"is_{CLASS_EOA_ETH_TRANSFER}")).select(
        *_COMMON,
        F.col("from"),
        F.col("to"),
        dec.alias("value"),
        F.col("value").alias("value_string"),
    )


def extract_gnosis_safe_eth_transfers(classified: DataFrame) -> DataFrame:
    """(initiator=tx.from, from=tx.to(safe), to=decoded, value=decoded)
    — all lowercased (GnosisSafeEthTransferDetailExtractor.cs:13-37,
    TransactionClassifier.cs:309-312)."""
    return classified.filter(F.col(f"is_{CLASS_SAFE_ETH_TRANSFER}")).select(
        *_COMMON,
        F.lower(F.col("from")).alias("initiator"),
        F.lower(F.col("to")).alias("from"),
        F.col("_safe_to").alias("to"),
        *_value_cols(F.col("_safe_value_hex")),
    )


def extract_transactions(classified: DataFrame) -> DataFrame:
    """The transaction_2-shaped table (0.0.64.sql:358-377) with the
    classification label array (P8)."""
    dec = F.col("value").try_cast("decimal(38,0)")  # overflow→NULL policy
    return classified.select(
        "block_number",
        "timestamp",
        "hash",
        "index",
        F.col("from"),
        F.col("to"),
        dec.alias("value"),
        F.col("value").alias("value_string"),
        "input",
        "nonce",
        "type",
        "classification",
    )


def extract_all(
    classified: DataFrame, safe_owners: DataFrame | None = None, hub: str = HUB_ADDRESS
) -> dict[str, DataFrame]:
    """All event tables from one classified DataFrame
    (TransactionDetailExtractor.cs:10-48 dispatcher)."""
    return {
        "transaction": extract_transactions(classified),
        "crc_signup": extract_crc_signups(classified, safe_owners),
        "erc20_transfer": extract_erc20_transfers(classified),
        "crc_organisation_signup": extract_crc_organisation_signups(classified, hub),
        "crc_trust": extract_crc_trusts(classified, hub),
        "crc_hub_transfer": extract_crc_hub_transfers(classified),
        "eth_transfer": extract_eth_transfers(classified),
        "gnosis_safe_eth_transfer": extract_gnosis_safe_eth_transfers(classified),
    }
