"""The read-side analytics surface — the reference's ~25 Postgres views
(`DbMigrations/0.0.64.sql`) as DataFrame-returning functions.

Each function takes the promoted event tables (outputs of
operators.extract / operators.promote) and returns the view DataFrame;
`register_all` publishes them as temp views for spark.sql consumers.

Spark-first notes:
- View-level ORDER BY in the reference (ledger :780, balances :791,
  :805) is presentation-only and dropped here — a global sort is a
  scale anti-pattern; callers order when they need order.
- The timeline's OR-equi join (`user = from OR user = to`,
  :1445-1546) is rewritten as explode(array_distinct([from, to])) +
  equi join — identical row multiplicity (OR matches a user once even
  when both sides match) and shuffle-friendly.
- `crc_safe_accepted_crc`'s argmax-by-self-join (:1296-1319) is a
  ranking window instead — same "latest trust per accepted token"
  semantics, one shuffle, and deterministic under timestamp ties
  (block_number/index tie-break).
- signups are tiny relative to transfers at chain scale → broadcast.
- `now()` is parameterized (`as_of`) so alive/dead account views are
  testable (SURVEY §7 risk list).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blockchain_indexer_spark.schemas import EMPTY_ADDRESS



def _json(col: Column) -> Column:
    """to_json with explicit nulls: Postgres row_to_json/json_agg emit
    "field": null, while Spark's to_json DROPS null fields by default —
    a consumer ported from the reference indexing obj['token'] on an
    organisation signup (NULL token) would hit a missing key."""
    return F.to_json(col, {"ignoreNullFields": "false"})


def crc_all_signups(crc_signup: DataFrame, crc_organisation_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:716-731 — person + organisation signups unified;
    organisations have NULL token."""
    people = crc_signup.select("hash", "block_number", "index", "timestamp", "user", "token")
    orgs = crc_organisation_signup.select(
        "hash",
        "block_number",
        "index",
        "timestamp",
        F.col("organisation").alias("user"),
        F.lit(None).cast("string").alias("token"),
    )
    return people.unionByName(orgs)


def crc_token_transfer(erc20_transfer: DataFrame, crc_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:688-698 — transfers of CRC tokens only (token must
    belong to a signup). Signup side broadcast."""
    tokens = F.broadcast(crc_signup.select("token").distinct())
    return erc20_transfer.join(tokens, "token").select(
        "timestamp", "block_number", "index", "hash", "from", "to", "token", "value"
    )


def crc_ledger(erc20_transfer: DataFrame, crc_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:743-780 — double-entry ledger: +sum to the receiver,
    −sum from the sender, per (hash, token). The reference's UNION of
    two grouped branches is kept (branches can never collide — verb
    differs — so unionByName is exact)."""
    signups = F.broadcast(crc_signup.select(F.col("token"), F.col("user").alias("token_owner")))
    t = erc20_transfer.join(signups, "token")

    def branch(endpoint: str, verb: str, sign: int) -> DataFrame:
        return (
            t.groupBy("hash", "block_number", "timestamp", endpoint, "token", "token_owner")
            .agg((F.lit(sign) * F.sum("value")).cast("decimal(38,0)").alias("value"))
            .select(
                "timestamp",
                F.col("hash").alias("transaction_id"),
                F.lit(verb).alias("verb"),
                "value",
                "token",
                "token_owner",
                F.lit("to" if sign > 0 else "from").alias("predicate"),
                F.col(endpoint).alias("safe_address"),
                "block_number",
            )
        )

    return branch("to", "add", 1).unionByName(branch("from", "remove", -1))


def crc_balances_by_safe(ledger: DataFrame) -> DataFrame:
    """0.0.64.sql:786-791."""
    return ledger.groupBy("safe_address").agg(
        F.sum("value").cast("decimal(38,0)").alias("balance")
    )


def crc_balances_by_safe_and_token(ledger: DataFrame) -> DataFrame:
    """0.0.64.sql:797-805, plus `last_change_at_block` which the
    reference maintains on the cache twin of this view
    (cache_crc_balances_by_safe_and_token, 0.0.64.sql:280-289) to
    drive the change feed (T9)."""
    return ledger.groupBy("safe_address", "token", "token_owner").agg(
        F.sum("value").cast("decimal(38,0)").alias("balance"),
        F.max("timestamp").alias("last_change_at"),
        F.max("block_number").alias("last_change_at_block"),
    )


def crc_current_trust(crc_trust: DataFrame, all_signups: DataFrame) -> DataFrame:
    """0.0.64.sql:1074-1100 — latest trust edge per (user, can_send_to)
    where both endpoints are signed up; limit of the newest event."""
    sa = F.broadcast(all_signups.select(F.col("user"), F.col("token").alias("user_token")))
    sb = F.broadcast(
        all_signups.select(
            F.col("user").alias("can_send_to"), F.col("token").alias("can_send_to_token")
        )
    )
    w = W.partitionBy("address", "can_send_to").orderBy(
        F.desc("block_number"), F.desc("index")
    )
    return (
        crc_trust.join(sa, crc_trust["address"] == sa["user"])
        .join(sb, "can_send_to")
        .withColumn("row_no", F.row_number().over(w))
        .filter(F.col("row_no") == 1)
        .select(
            "user",
            "user_token",
            "can_send_to",
            "can_send_to_token",
            "limit",
            F.lit(0).cast("bigint").alias("history_count"),
            F.col("timestamp").alias("last_change"),
            # cache_crc_current_trust (0.0.64.sql:316-327) tracks the
            # block of the winning event for the change feed (T9)
            F.col("block_number").alias("last_change_at_block"),
        )
    )


def erc20_minting(erc20_transfer: DataFrame) -> DataFrame:
    """0.0.64.sql:1265-1275 — transfers from the zero address."""
    return erc20_transfer.filter(F.col("from") == EMPTY_ADDRESS).select(
        "timestamp", "block_number", "index", "hash", "from", "to", "token", "value"
    )


def crc_minting(erc20_transfer: DataFrame, crc_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:1281-1292 — mintings of CRC tokens."""
    tokens = F.broadcast(crc_signup.select("token").distinct())
    return erc20_minting(erc20_transfer).join(tokens, "token").select(
        "timestamp", "block_number", "index", "hash", "from", "to", "token", "value"
    )


def crc_total_minted_amount(erc20_transfer: DataFrame, crc_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:1575-1578."""
    return crc_minting(erc20_transfer, crc_signup).agg(
        F.sum("value").cast("decimal(38,0)").alias("crc_total_minted_amount")
    )


def crc_signups_per_day(crc_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:1563-1569 (event rows already carry the block
    timestamp, so the block join is unnecessary here)."""
    return crc_signup.groupBy(F.to_date("timestamp").alias("day")).agg(
        F.count("*").alias("signups")
    )


def crc_hub_transfers_per_day(crc_hub_transfer: DataFrame) -> DataFrame:
    """0.0.64.sql:1253-1259."""
    return crc_hub_transfer.groupBy(F.to_date("timestamp").alias("day")).agg(
        F.count("*").alias("transfers")
    )


def _accounts_by_last_activity(
    token_transfer: DataFrame, as_of: _dt.datetime, alive: bool
) -> DataFrame:
    last = token_transfer.groupBy("to").agg(F.max("timestamp").alias("last_seen"))
    cutoff = F.lit(as_of) - F.expr("INTERVAL 90 DAYS")
    # strict > / < on BOTH sides, faithful to the reference
    # (:704-714 / :1241-1251): an account whose last activity falls
    # EXACTLY on the cutoff instant is in neither view. Measure-zero
    # under the reference's continuous now(); reachable with a
    # parameterized as_of — callers needing an exhaustive partition
    # should offset as_of by a tick.
    cond = F.col("last_seen") > cutoff if alive else F.col("last_seen") < cutoff
    return last.filter(cond).select("to")


def crc_alive_accounts(token_transfer: DataFrame, as_of: _dt.datetime) -> DataFrame:
    """0.0.64.sql:704-714 with now() parameterized."""
    return _accounts_by_last_activity(token_transfer, as_of, alive=True)


def crc_dead_accounts(token_transfer: DataFrame, as_of: _dt.datetime) -> DataFrame:
    """0.0.64.sql:1241-1251."""
    return _accounts_by_last_activity(token_transfer, as_of, alive=False)


def crc_safe_accepted_crc(crc_trust: DataFrame, crc_signup: DataFrame) -> DataFrame:
    """0.0.64.sql:1296-1319 — for each safe, the latest trust limit per
    accepted (token, owner). Argmax self-join rewritten as a ranking
    window (deterministic under ties via block_number/index)."""
    s = F.broadcast(
        crc_signup.select(
            F.col("user").alias("accepted_token_owner"),
            F.col("token").alias("accepted_token"),
        )
    )
    ev = crc_trust.join(s, crc_trust["address"] == F.col("accepted_token_owner")).select(
        "timestamp",
        "block_number",
        "index",
        F.col("can_send_to").alias("safe_address"),
        "accepted_token",
        "accepted_token_owner",
        "limit",
    )
    w = W.partitionBy("safe_address", "accepted_token", "accepted_token_owner").orderBy(
        F.desc("timestamp"), F.desc("block_number"), F.desc("index")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("timestamp", "safe_address", "accepted_token", "accepted_token_owner", "limit")
    )


def erc20_balances_by_safe_and_token(
    erc20_transfer: DataFrame,
    crc_signup: DataFrame,
    crc_organisation_signup: DataFrame,
) -> DataFrame:
    """0.0.64.sql:1584-1637 — signed in/out balances of NON-CRC tokens
    (J7 anti-join) per signed-up account (A6 signed sum).

    Faithfulness note: the reference OR-joins crc_all_signups TWICE
    (non_circles_transfers :1595, then non_circles_ledger :1619), so a
    transfer with BOTH endpoints signed up is counted twice per
    endpoint; that multiplicity is preserved here. The OR join is
    rewritten as explode(array_distinct([from, to])) + equi join (one
    match per distinct endpoint value, same as the OR predicate).
    """
    alls = F.broadcast(
        crc_all_signups(crc_signup, crc_organisation_signup).select("user")
    )
    crc_tokens = F.broadcast(crc_signup.select("token").distinct())
    non_crc = erc20_transfer.join(crc_tokens, "token", "left_anti")
    endpoints = F.explode(F.array_distinct(F.array(F.col("from"), F.col("to"))))
    # join 1: multiplies each transfer by its signed-up endpoint count
    multiplied = (
        non_crc.withColumn("_ep", endpoints)
        .join(alls, F.col("_ep") == F.col("user"))
        .drop("_ep", "user")
    )
    # join 2: one ledger row per (copy, matching endpoint)
    ledger = multiplied.withColumn("user", endpoints).join(alls, "user")
    signed = F.when(F.col("from") == F.col("user"), -F.col("value")).otherwise(
        F.col("value")
    )
    return (
        ledger.groupBy(F.col("user").alias("safe_address"), "token")
        .agg(
            F.sum(signed).cast("decimal(38,0)").alias("balance"),
            F.max("timestamp").alias("last_changed_at"),
        )
    )


def formatted(df: DataFrame) -> DataFrame:
    """formatted_* views (0.0.64.sql:1324-1382): value numeric → text.
    Works for any event table carrying a `value` column."""
    return df.withColumn("value", F.col("value").cast("string"))


# --- timeline ----------------------------------------------------------


def _endpoint_join(df: DataFrame, users: DataFrame, left: str, right: str) -> DataFrame:
    """OR-equi join rewrite: user matches `left` or `right`. One output
    row per matching user (array_distinct collapses self-events, like
    the OR predicate does)."""
    exploded = df.withColumn(
        "user", F.explode(F.array_distinct(F.array(F.col(left), F.col(right))))
    )
    return exploded.join(F.broadcast(users), "user")


def _direction(left: Column, right: Column) -> Column:
    return (
        F.when((left == F.col("user")) & (right == F.col("user")), "self")
        .when(left == F.col("user"), "out")
        .otherwise("in")
    )


def _contact(left: Column, right: Column) -> Column:
    return (
        F.when((left == F.col("user")) & (right == F.col("user")), right)
        .when(left == F.col("user"), right)
        .otherwise(left)
    )


_TL_COLS = [
    "timestamp",
    "block_number",
    "transaction_index",
    "transaction_hash",
    "type",
    "safe_address",
    "contact_address",
    "direction",
    "value",
    "obj",
]


def crc_safe_timeline(
    tables: dict[str, DataFrame],
    signups: DataFrame | None = None,
) -> DataFrame:
    """0.0.64.sql:1397-1557 — unified per-account activity feed:
    7 event branches normalized to one schema, JSON payload per row.

    The hub-transfer branch's nested transitive-path JSON (:1431-1444)
    is built with a grouped collect_list over crc_token_transfer
    instead of correlated subqueries.

    `signups` lets callers pass a persisted crc_all_signups frame
    (the reference's cache-table pattern) — it feeds 3 of the 7
    branches, so sharing one materialization trims both plan size
    and recompute.
    """
    if signups is None:
        signups = crc_all_signups(tables["crc_signup"], tables["crc_organisation_signup"])
    users = signups.select("user").distinct()

    def base(df: DataFrame, typ: str, value: Column, obj: Column) -> DataFrame:
        return df.select(
            "timestamp",
            "block_number",
            F.col("index").alias("transaction_index"),
            F.col("hash").alias("transaction_hash"),
            F.lit(typ).alias("type"),
            F.col("user").alias("safe_address"),
            F.col("contact_address"),
            F.col("direction"),
            value.cast("string").alias("value"),
            obj.alias("obj"),
        )

    # CrcSignup branch: self event, obj = the signup row itself
    b_signup = base(
        signups.withColumn("contact_address", F.col("user")).withColumn(
            "direction", F.lit("self")
        ),
        "CrcSignup",
        F.lit(0),
        _json(F.struct("hash", "block_number", "index", "timestamp", "user", "token")),
    )

    # CrcHubTransfer branch with transitive path payload
    tt = crc_token_transfer(tables["erc20_transfer"], tables["crc_signup"])
    # sort_array: collect_list order is task-scheduling-dependent; the
    # reference's correlated subquery (:1438-1442) has no ORDER BY
    # either, so a deterministic lexicographic step order is a strict
    # improvement — payloads are stable across runs and engines
    steps = tt.groupBy("hash").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("from"), F.col("to"), F.col("token"), F.col("value").cast("string").alias("value")
                )
            )
        ).alias("transfers")
    )
    ht = (
        tables["crc_hub_transfer"]
        .join(steps, "hash", "left")
        .withColumn(
            "obj_pre",
            _json(
                F.array(
                    F.struct(
                        F.col("hash").alias("transactionHash"),
                        F.col("from"),
                        F.col("to"),
                        F.col("value").cast("string").alias("flow"),
                        F.col("transfers"),
                    )
                )
            ),
        )
    )
    ht_j = _endpoint_join(ht, users, "from", "to")
    b_hub = base(
        ht_j.withColumn("contact_address", _contact(F.col("from"), F.col("to"))).withColumn(
            "direction", _direction(F.col("from"), F.col("to"))
        ),
        "CrcHubTransfer",
        F.col("value"),
        F.col("obj_pre"),
    )

    # CrcTrust branch: user matches address (out) or can_send_to side.
    # Reference direction: can_send_to == user → 'out' (:1459-1464).
    tr = tables["crc_trust"]
    tr_j = _endpoint_join(tr, users, "address", "can_send_to")
    b_trust = base(
        tr_j.withColumn(
            "contact_address",
            F.when(
                (F.col("can_send_to") == F.col("user")) & (F.col("address") == F.col("user")),
                F.col("user"),
            )
            .when(F.col("can_send_to") == F.col("user"), F.col("address"))
            .otherwise(F.col("can_send_to")),
        ).withColumn(
            "direction",
            F.when(
                (F.col("can_send_to") == F.col("user")) & (F.col("address") == F.col("user")),
                "self",
            )
            .when(F.col("can_send_to") == F.col("user"), "out")
            .otherwise("in"),
        ),
        "CrcTrust",
        F.col("limit"),
        _json(
            F.struct(
                "block_number", "timestamp", "hash", "index", "address", "can_send_to", "limit"
            )
        ),
    )

    # CrcMinting branch: joined on token ownership, direction 'in'
    mint = crc_minting(tables["erc20_transfer"], tables["crc_signup"])
    mint_j = mint.join(
        F.broadcast(signups.select("user", "token").filter(F.col("token").isNotNull())),
        "token",
    )
    b_mint = base(
        mint_j.withColumn("contact_address", F.col("from")).withColumn("direction", F.lit("in")),
        "CrcMinting",
        F.col("value"),
        _json(
            F.struct(
                "timestamp", "block_number", "index", "hash", "from", "to", "token", "value"
            )
        ),
    )

    # EthTransfer / non-CRC Erc20Transfer / GnosisSafeEthTransfer
    def simple_branch(df: DataFrame, typ: str, extra: list[str]) -> DataFrame:
        j = _endpoint_join(df, users, "from", "to")
        return base(
            j.withColumn("contact_address", _contact(F.col("from"), F.col("to"))).withColumn(
                "direction", _direction(F.col("from"), F.col("to"))
            ),
            typ,
            F.col("value"),
            _json(
                F.struct(
                    "timestamp", "block_number", "index", "hash", "from", "to", "value", *extra
                )
            ),
        )

    b_eth = simple_branch(tables["eth_transfer"], "EthTransfer", [])
    crc_tokens = F.broadcast(tables["crc_signup"].select("token").distinct())
    non_crc = tables["erc20_transfer"].join(crc_tokens, "token", "left_anti")
    b_erc20 = simple_branch(non_crc, "Erc20Transfer", ["token"])
    b_safe = simple_branch(
        tables["gnosis_safe_eth_transfer"], "GnosisSafeEthTransfer", ["initiator"]
    )

    out = b_signup
    for b in (b_hub, b_trust, b_mint, b_eth, b_erc20, b_safe):
        out = out.unionByName(b)
    return out.select(*_TL_COLS)


# --- capacity graph ----------------------------------------------------


def crc_capacity_graph(
    current_trust: DataFrame,
    balances: DataFrame,
    all_signups: DataFrame,
    since_block: int | None = None,
) -> DataFrame:
    """0.0.64.sql:815-939 — the transfer-capacity edge list consumed by
    the pathfinder: for each (token_holder, can_send_to) pair where the
    receiver trusts the token's owner, the max transferable amount.

    Implemented as the same 8-stage join chain; signups and trust are
    the small sides and broadcast. `capacity` keeps the reference's
    exact clamp ladder including the `zero` special case.

    `since_block` switches this into the pull-based change feed
    `get_capacity_changes_since_block_2` (0.0.64.sql:1902-2034, T9):
    only edges whose holder balance OR trust edge changed at or after
    the cursor block are returned — same columns, so consumers diff
    incrementally.
    """
    accepted = (
        current_trust.filter(F.col("limit") > 0)
        .join(
            F.broadcast(
                all_signups.select(
                    F.col("user").alias("cas_user"), F.col("token").alias("own_token")
                )
            ),
            current_trust["can_send_to"] == F.col("cas_user"),
        )
        .select(
            F.col("can_send_to").alias("potential_token_receiver"),
            F.col("user_token").alias("accepted_token"),
            current_trust["user"].alias("accepted_token_owner"),
            F.col("own_token").alias("receivers_own_token"),
            F.col("own_token").isNull().alias("receiver_is_orga"),
            F.col("limit"),
            F.col("last_change_at_block").alias("trust_last_change_at_block"),
        )
    )
    holdings = (
        accepted.join(
            balances, accepted["accepted_token"] == balances["token"]
        )
        .filter(
            (F.col("safe_address") != EMPTY_ADDRESS)
            & (F.col("safe_address") != "0x0000000000000000000000000000000000000001")
            & (F.col("balance") > 0)
            & (F.col("safe_address") != F.col("potential_token_receiver"))
        )
        .select(
            F.col("safe_address").alias("token_holder"),
            F.col("balance"),
            F.col("accepted_token").alias("token"),
            F.col("accepted_token_owner").alias("token_owner"),
            F.col("potential_token_receiver").alias("can_send_to"),
            F.col("receiver_is_orga").alias("can_send_to_is_orga"),
            (F.col("receivers_own_token") == F.col("accepted_token")).alias(
                "is_receivers_own_token"
            ),
            F.col("limit"),
            balances["last_change_at_block"].alias("balance_last_change_at_block"),
            F.col("trust_last_change_at_block"),
        )
    )
    if since_block is not None:
        holdings = holdings.filter(
            (F.col("balance_last_change_at_block") >= since_block)
            | (F.col("trust_last_change_at_block") >= since_block)
        )
    owner_bal = balances.select(
        F.col("safe_address").alias("token_owner"),
        F.col("token"),
        F.col("balance").alias("token_owners_own_balance"),
    )
    recv_bal = balances.select(
        F.col("safe_address").alias("can_send_to"),
        F.col("token"),
        F.col("balance").alias("receiver_token_balance"),
    )
    h = (
        holdings.join(owner_bal, ["token_owner", "token"], "left")
        .join(recv_bal, ["can_send_to", "token"], "left")
        .withColumn(
            "token_owners_own_balance",
            F.coalesce(F.col("token_owners_own_balance"), F.lit(0).cast("decimal(38,0)")),
        )
        .withColumn(
            "receiver_token_balance",
            F.coalesce(F.col("receiver_token_balance"), F.lit(0).cast("decimal(38,0)")),
        )
        .withColumn(
            "max_transferable_amount",
            F.col("token_owners_own_balance") * F.col("limit") / 100,
        )
        .withColumn(
            "receiver_token_balance_scaled",
            F.col("receiver_token_balance") * (F.lit(100) - F.col("limit")) / 100,
        )
        .withColumn(
            "max_capacity",
            F.col("max_transferable_amount") - F.col("receiver_token_balance_scaled"),
        )
        .withColumn(
            "zero",
            (F.col("receiver_token_balance") > 0)
            & (F.col("max_transferable_amount") < F.col("receiver_token_balance")),
        )
        .withColumn(
            "actual_capacity",
            F.when(F.col("max_capacity") < F.col("balance"), F.col("max_capacity")).otherwise(
                # scale 6 so the CASE below does not collapse the
                # fractional branches to scale 0 (HALF_UP sub-wei
                # rounding the reference's unbounded numeric never does)
                F.col("balance").cast("decimal(38,6)")
            ),
        )
    )
    return h.select(
        "token_holder",
        "token",
        "token_owner",
        "balance",
        "can_send_to",
        "can_send_to_is_orga",
        F.when(
            F.col("is_receivers_own_token") | F.col("can_send_to_is_orga"),
            F.col("balance").cast("decimal(38,6)"),
        )
        .otherwise(
            F.when(F.col("zero"), F.lit(0).cast("decimal(38,6)")).otherwise(
                F.col("actual_capacity")
            )
        )
        .alias("capacity"),
    )


def get_capacity(
    balances: DataFrame,
    current_trust: DataFrame,
    from_: str,
    to: str,
    token_owner: str,
) -> DataFrame:
    """0.0.64.sql:1674-1739 — the pathfinder's debug/explain UDTF:
    the capacity calculation between one (from, to, token_owner)
    triple unrolled into labeled steps (id, label, value).

    The reference's scalar subqueries become single-row aggregates
    cross-joined together — all filters push down to the balance scan.

    Fidelity note: step 6 ('max') is v5 × v4 / 100 — the RECEIVER's
    balance of their own token times the trust limit — exactly as the
    reference computes it (:1712-1716, args.id=5 × args.id=4). The
    capacity VIEW (crc_capacity_graph, :1599) instead scales the TOKEN
    OWNER's own balance; the two disagree in the reference itself, and
    this function replicates the reference's explain math verbatim
    rather than reconciling them.
    """
    b = balances
    t = current_trust

    def scalar(df: DataFrame, col: str, alias: str) -> DataFrame:
        return df.agg(F.first(F.col(col)).alias(alias))

    args = (
        scalar(
            b.filter((F.col("safe_address") == token_owner) & (F.col("token_owner") == token_owner)),
            "balance", "v1",
        )
        .crossJoin(
            scalar(
                b.filter((F.col("safe_address") == to) & (F.col("token_owner") == token_owner)),
                "balance", "v2",
            )
        )
        .crossJoin(
            scalar(
                b.filter((F.col("safe_address") == from_) & (F.col("token_owner") == token_owner)),
                "balance", "v3",
            )
        )
        .crossJoin(
            scalar(
                t.filter((F.col("can_send_to") == to) & (F.col("user") == token_owner)),
                "limit", "v4",
            )
        )
        .crossJoin(
            scalar(
                b.filter((F.col("safe_address") == to) & (F.col("token_owner") == to)),
                "balance", "v5",
            )
        )
    )
    stepped = args.select(
        "*",
        (F.col("v5") * F.col("v4") / 100).alias("v6"),
        (F.col("v2") * (F.lit(100) - F.col("v4")) / 100).alias("v7"),
    ).select(
        "*",
        F.when(F.col("v6") < F.col("v2"), F.lit(1)).otherwise(F.lit(0)).alias("v8"),
        F.when(F.col("v6") < F.col("v2"), F.lit(0).cast("decimal(38,6)"))
        .otherwise((F.col("v6") - F.col("v7")).cast("decimal(38,6)"))
        .alias("v9"),
    )
    labels = [
        (1, "token_owner's balance of token_owner's own tokens"),
        (2, "receiver's balance of token_owner's tokens"),
        (3, "senders's balance of token_owner's tokens"),
        (4, "receiver's trust in token_owner's token (%)"),
        (5, "receiver's balance of receiver's own tokens"),
        (6, "max"),
        (7, "destBalanceScaled"),
        (8, "max < receiver's balance of token_owner's tokens"),
        (9, "sendLimit"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("id"),
                F.lit(lbl).alias("label"),
                F.col(f"v{i}").cast("decimal(38,6)").alias("value"),
            )
            for i, lbl in labels
        ]
    )
    return stepped.select(F.explode(rows).alias("s")).select("s.id", "s.label", "s.value")


# --- registration ------------------------------------------------------


def build_all(
    tables: dict[str, DataFrame], as_of: _dt.datetime | None = None
) -> dict[str, DataFrame]:
    """Materialize the whole view DAG from the promoted event tables.

    `as_of` parameterizes now() for alive/dead accounts; defaults to a
    fixed far-future instant (everything alive) to stay deterministic.
    """
    as_of = as_of or _dt.datetime(2100, 1, 1)
    signups = crc_all_signups(tables["crc_signup"], tables["crc_organisation_signup"])
    tt = crc_token_transfer(tables["erc20_transfer"], tables["crc_signup"])
    ledger = crc_ledger(tables["erc20_transfer"], tables["crc_signup"])
    balances = crc_balances_by_safe_and_token(ledger)
    trust = crc_current_trust(tables["crc_trust"], signups)
    views = {
        "crc_all_signups": signups,
        "crc_token_transfer": tt,
        "crc_ledger": ledger,
        "crc_balances_by_safe": crc_balances_by_safe(ledger),
        "crc_balances_by_safe_and_token": balances,
        "crc_current_trust": trust,
        "erc20_minting": erc20_minting(tables["erc20_transfer"]),
        "crc_minting": crc_minting(tables["erc20_transfer"], tables["crc_signup"]),
        "crc_total_minted_amount": crc_total_minted_amount(
            tables["erc20_transfer"], tables["crc_signup"]
        ),
        "crc_signups_per_day": crc_signups_per_day(tables["crc_signup"]),
        "crc_hub_transfers_per_day": crc_hub_transfers_per_day(tables["crc_hub_transfer"]),
        "crc_alive_accounts": crc_alive_accounts(tt, as_of),
        "crc_dead_accounts": crc_dead_accounts(tt, as_of),
        "crc_safe_accepted_crc": crc_safe_accepted_crc(
            tables["crc_trust"], tables["crc_signup"]
        ),
        "formatted_crc_hub_transfer": formatted(tables["crc_hub_transfer"]),
        "formatted_erc20_transfer": formatted(tables["erc20_transfer"]),
        "formatted_eth_transfer": formatted(tables["eth_transfer"]),
        "formatted_gnosis_safe_eth_transfer": formatted(tables["gnosis_safe_eth_transfer"]),
        "formatted_crc_minting": formatted(
            crc_minting(tables["erc20_transfer"], tables["crc_signup"])
        ),
        "erc20_balances_by_safe_and_token": erc20_balances_by_safe_and_token(
            tables["erc20_transfer"],
            tables["crc_signup"],
            tables["crc_organisation_signup"],
        ),
        "crc_safe_timeline": crc_safe_timeline(tables, signups=signups),
        "crc_capacity_graph": crc_capacity_graph(trust, balances, signups),
    }
    return views


def register_all(tables: dict[str, DataFrame], as_of: _dt.datetime | None = None) -> None:
    """createOrReplaceTempView for every view (spark.sql surface)."""
    for name, df in build_all(tables, as_of).items():
        df.createOrReplaceTempView(name)
