"""Generated per-event decoded views (reference init.sql:213-222, B21).

The reference generates one Postgres view per event signature from contract
ABIs; each is a project+filter over ``logs`` (``WHERE topic0 = '<keccak>'``)
whose select list applies the decode library.  Here the same specs generate
Spark temp views built with the native Column builders — the view expands in
the analyzer and the ``topic0`` equality pushes down to the scan (the
Catalyst analog of the reference's btree-index access path, schema.sql:59).

View naming convention (README.md:62-67): EventName followed by
``_<type>_<param>`` per parameter, with ``_d`` marking decimal-decoded
uint256 columns — e.g. ``Transfer_address_from_address_to_uint256_amount_d``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .functions import decode
from . import fixtures


@dataclass(frozen=True)
class EventParam:
    type: str  # solidity type: 'address' | 'uint256' | ...
    name: str
    indexed: bool


@dataclass(frozen=True)
class EventSpec:
    name: str  # event name, e.g. 'Transfer'
    topic0: str  # keccak signature hash
    params: list[EventParam] = field(default_factory=list)

    @property
    def view_name(self) -> str:
        parts = [self.name]
        for p in self.params:
            parts.append(p.type)
            parts.append(p.name)
            if p.type.startswith("uint") and int(p.type[4:] or 256) > 64:
                parts.append("d")
        return "_".join(parts)


def _decode_param(p: EventParam, topic_idx: int, data_pos: int):
    src = F.col(f"topic{topic_idx}") if p.indexed else F.col("data")
    pos = 2 if p.indexed else data_pos
    t = p.type
    if t == "address":
        return decode.to_address(pos, src)
    if t == "uint256":
        return decode.to_uint256(pos, src)
    if t == "uint128":
        return decode.to_uint128(pos, src)
    if t == "uint64":
        return decode.to_uint64(pos, src)
    if t == "uint32":
        return decode.to_uint32(pos, src)
    if t == "int64":
        return decode.to_int64(pos, src)
    if t == "int32":
        return decode.to_int32(pos, src)
    if t == "bool":
        return decode.to_bool(pos, src)
    if t == "string":
        return decode.to_string(pos, src)
    if t == "bytes":
        return decode.to_bytes(pos, src)
    return decode.to_element(pos, src, t)


def event_view_df(logs: DataFrame, spec: EventSpec) -> DataFrame:
    """Project+filter DataFrame for one event spec (init.sql:213-222 shape)."""
    cols = []
    topic_idx = 0
    data_word = 0
    for p in spec.params:
        if p.indexed:
            topic_idx += 1
            cols.append(_decode_param(p, topic_idx, 0).alias(p.name))
        else:
            pos = 2 + 64 * data_word
            data_word += 1
            cols.append(_decode_param(p, 0, pos).alias(p.name))
    cols += [
        F.col("address").alias("contract_address"),
        F.col("transaction_hash").alias("evt_tx_hash"),
        F.col("log_index").alias("evt_index"),
        F.col("block_timestamp").alias("evt_block_time"),
        F.col("block_number").alias("evt_block_number"),
    ]
    return logs.filter(F.col("topic0") == spec.topic0).select(*cols)


def _p(type_: str, name: str, indexed: bool = False) -> EventParam:
    return EventParam(type_, name, indexed)


# The reference's shipped default view set, one per init.sql:213-222 line.
DEFAULT_EVENTS: list[EventSpec] = [
    EventSpec(
        "Approval",
        fixtures.TOPIC_APPROVAL,
        [_p("address", "owner", True), _p("address", "spender", True), _p("uint256", "amount")],
    ),
    EventSpec(
        "AuthorityUpdated",
        fixtures.TOPIC_AUTHORITY_UPDATED,
        [_p("address", "user", True), _p("address", "newAuthority", True)],
    ),
    EventSpec(
        "Deposit",
        fixtures.TOPIC_DEPOSIT,
        [
            _p("address", "caller", True),
            _p("address", "owner", True),
            _p("uint256", "assets"),
            _p("uint256", "shares"),
        ],
    ),
    EventSpec(
        "FeePercentUpdated",
        "0xec370615cc81fb334e5566fbc80664d9082377bf59288d64a79f3fbecf4323a9",
        [_p("address", "user", True), _p("uint256", "newFeePercent")],
    ),
    EventSpec(
        "OwnershipTransferred",
        fixtures.TOPIC_OWNERSHIP_TRANSFERRED,
        [_p("address", "user", True), _p("address", "newOwner", True)],
    ),
    EventSpec(
        "StrategyDeposit",
        "0xc6f6f91a48277d76f232cc08a9a30f6b05b3fd9b92c3180c25936e17a22a1025",
        [_p("address", "user", True), _p("uint256", "underlyingAmount")],
    ),
    EventSpec(
        "StrategyWithdrawal",
        "0xd5ad0f046bd35f48b421a3e575435de38cea1980177b1c6da935d2f26049f3fa",
        [_p("address", "user", True), _p("uint256", "underlyingAmount")],
    ),
    EventSpec(
        "TargetFloatPercentUpdated",
        "0x95bc4480b51f4860106d42850bcae222cf3303fb2b7d433e896205e0ebefe369",
        [_p("address", "user", True), _p("uint256", "newTargetFloatPercent")],
    ),
    EventSpec(
        "Transfer",
        fixtures.TOPIC_TRANSFER,
        [_p("address", "from", True), _p("address", "to", True), _p("uint256", "amount")],
    ),
    EventSpec(
        "Withdraw",
        fixtures.TOPIC_WITHDRAW,
        [
            _p("address", "caller", True),
            _p("address", "receiver", True),
            _p("address", "owner", True),
            _p("uint256", "assets"),
            _p("uint256", "shares"),
        ],
    ),
]


def register_event_views(
    spark, logs: DataFrame, events: list[EventSpec] | None = None
) -> list[str]:
    names = []
    for spec in events or DEFAULT_EVENTS:
        df = event_view_df(logs, spec)
        df.createOrReplaceTempView(spec.view_name)
        names.append(spec.view_name)
    return names


def _canonical_type(i: dict) -> str:
    """Canonical ABI type for signature hashing: ``tuple`` (and
    ``tuple[]``/``tuple[k]``/nested) expands recursively into its
    ``components`` — ``(address,uint256)[]`` — because keccak over a
    signature containing the literal word 'tuple' is a wrong topic0 that
    silently matches nothing."""
    t = i["type"]
    if t == "tuple" or t.startswith("tuple["):
        comps = i.get("components")
        if not comps:
            raise ValueError(
                f"ABI tuple type {t!r} has no 'components'; cannot form "
                "a canonical event signature"
            )
        inner = ",".join(_canonical_type(c) for c in comps)
        return f"({inner}){t[len('tuple'):]}"
    return t


def from_abi(abi: list[dict]) -> list[EventSpec]:
    """Build EventSpecs straight from a standard Solidity ABI JSON array
    (the artifact every user already has) — topic0 computed with
    Keccak-256 over the canonical signature, so no hand-maintained hash
    constants.  Anonymous events are skipped (they carry no topic0).

    The reference requires hand-writing each view + hash into init.sql
    (init.sql:213-222); this derives the same views mechanically."""
    from .functions.keccak import event_topic0

    specs = []
    for entry in abi:
        if entry.get("type") != "event" or entry.get("anonymous"):
            continue
        inputs = entry.get("inputs", [])
        sig = f"{entry['name']}({','.join(_canonical_type(i) for i in inputs)})"
        specs.append(
            EventSpec(
                entry["name"],
                event_topic0(sig),
                [
                    EventParam(i["type"], i["name"], bool(i.get("indexed")))
                    for i in inputs
                ],
            )
        )
    return specs


# --------------------------------------------------------------------------
# SQL bootstrap generator — the init.sql:213-222 artifact re-emitted as
# Spark SQL text (stage 5: spec -> naming convention -> CREATE VIEW).
# Requires decode.register_sql_functions(spark) for the decoder calls.
# --------------------------------------------------------------------------

def _param_sql(p: EventParam, topic_idx: int, data_pos: int) -> str:
    src = f"topic{topic_idx}" if p.indexed else "data"
    pos = 2 if p.indexed else data_pos
    known = {
        "address", "uint256", "uint128", "uint64", "uint32",
        "int64", "int32", "bool", "string", "bytes",
    }
    if p.type in known:
        return f"to_{p.type}({pos}, {src}) AS `{p.name}`"
    return f"to_element({pos}, {src}, '{p.type}') AS `{p.name}`"


def view_sql(spec: EventSpec, logs_table: str = "logs") -> str:
    """CREATE OR REPLACE TEMP VIEW statement for one event spec."""
    exprs = []
    topic_idx = 0
    data_word = 0
    for p in spec.params:
        if p.indexed:
            topic_idx += 1
            exprs.append(_param_sql(p, topic_idx, 0))
        else:
            exprs.append(_param_sql(p, 0, 2 + 64 * data_word))
            data_word += 1
    exprs += [
        "address AS contract_address",
        "transaction_hash AS evt_tx_hash",
        "log_index AS evt_index",
        "block_timestamp AS evt_block_time",
        "block_number AS evt_block_number",
    ]
    cols = ",\n  ".join(exprs)
    return (
        f"CREATE OR REPLACE TEMP VIEW `{spec.view_name}` AS\n"
        f"SELECT\n  {cols}\n"
        f"FROM {logs_table}\n"
        f"WHERE topic0 = '{spec.topic0}'"
    )


def bootstrap_sql(
    logs_table: str = "logs", events: list[EventSpec] | None = None
) -> str:
    """The full init.sql-equivalent bootstrap script (one statement per
    view; run each through ``spark.sql`` after registering the decode
    functions)."""
    return ";\n\n".join(
        view_sql(s, logs_table) for s in (events or DEFAULT_EVENTS)
    )
