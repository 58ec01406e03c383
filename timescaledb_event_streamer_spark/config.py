"""Config-file-driven pipeline assembly (SURVEY §2 gap closed in r6).

The reference is configured entirely through TOML/YAML
(`spi/config/configuration.go`, `spi/config/unmarshall.go`,
`config.example.toml`): sink choice, table filters, snapshot mode,
topic naming, tombstone generation, state storage. This module is
the loader that turns that SAME config surface into a wired Spark
pipeline over the components this repo already implements:

- table filters     -> catalog.tablefilter.TableFilter
  (`internal/systemcatalog/tablefiltering/tablefilter.go`)
- topic naming      -> catalog.naming (debezium strategy;
  `internal/eventing/namingstrategy/`)
- envelope + route  -> streaming.pipelines.filtered_routed (I3)
- event-type flags  -> logicalreplicationresolver defaults
  (`replicationresolver.go:105-135`: read/insert/update/delete/
  truncate default true, message/compression/decompression false)
- tombstones        -> the A10 delete+tombstone emission
  (`eventemitter.go`, gated on sink.tombstone, default false)
- sink shaping      -> sinks.encoders / sinks.writers wire contracts
- snapshot mode     -> replicationchannel.go:199-226 always /
  initial_only / never decision
- state storage     -> file path the checkpoint/offset mirror uses
  (`spi/statestorage/filestatestorage.go` semantics)

Property lookup mirrors `config.GetOrDefault`
(`configuration.go:374-441`): an environment variable named after
the canonical property (upper-cased, ``_`` doubled, dots to ``_``)
overrides the file, and Go-zero values (absent, empty string, empty
list) fall back to the default.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINK_TYPES = ("stdout", "nats", "kafka", "redis", "kinesis", "sqs", "http")
STATE_STORAGE_TYPES = ("none", "file")
NAMING_STRATEGY_TYPES = ("debezium",)
SNAPSHOT_MODES = ("always", "never", "initial_only")


# --------------------------------------------------------------- loading


def _merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_raw(path: str) -> dict:
    """Parse a TOML or YAML config file into one nested dict.

    TOML dotted keys (`postgresql.publication.name = ...`, the
    reference example style) nest natively under tomllib; YAML (the
    reference supports both, `unmarshall.go`) parses via PyYAML when
    installed, else the dependency-free subset parser in
    config_yaml.py (nested mappings, scalars, scalar lists — the
    whole config surface; exotic constructs raise ValueError)."""
    if path.endswith((".yml", ".yaml")):
        try:
            import yaml  # type: ignore[import-not-found]
        except ImportError:
            from timescaledb_event_streamer_spark.config_yaml import (
                parse_yaml_subset,
            )

            with open(path, "r") as fh:
                return parse_yaml_subset(fh.read())
        with open(path, "rb") as fh:
            return yaml.safe_load(fh) or {}
    with open(path, "rb") as fh:
        return tomllib.load(fh)


def _env_name(canonical: str) -> str:
    # configuration.go:428-430: upper-case, double existing
    # underscores, then dots become single underscores
    name = canonical.upper()
    name = name.replace("_", "__")
    return name.replace(".", "_")


def _convert_env(value: str, default: Any) -> Any:
    if isinstance(default, bool):
        return value.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int) and not isinstance(default, bool):
        return int(value)
    if isinstance(default, float):
        return float(value)
    return value


def _is_zero(value: Any) -> bool:
    # Go zero-value fallback (configuration.go:396): absent, empty
    # string and empty list re-resolve to the default. Numbers and
    # booleans written in the file are kept (the reference models
    # optional scalars as pointers, which are non-zero when set).
    return value is None or value == "" or value == [] or value == {}


def get_or_default(raw: dict, canonical: str, default: Any = None) -> Any:
    """`config.GetOrDefault` semantics over the parsed dict: env var
    override first, then the dotted path, then the default for
    missing/zero values."""
    env = os.environ.get(_env_name(canonical))
    if env:
        return _convert_env(env, default)
    node: Any = raw
    for part in canonical.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return default if _is_zero(node) else node


# ----------------------------------------------------------- typed view


@dataclass(frozen=True)
class TableSelection:
    """includes/excludes pattern lists
    (`IncludedTablesConfig`, configuration.go:240-243)."""

    includes: tuple[str, ...] = ()
    excludes: tuple[str, ...] = ()


@dataclass(frozen=True)
class EventFlags:
    """Which operations generate events
    (`TimescaleEventsConfig` / `PostgresqlEventsConfig`,
    defaults from replicationresolver.go:105-135)."""

    read: bool = True
    insert: bool = True
    update: bool = True
    delete: bool = True
    truncate: bool = True
    message: bool = False
    compression: bool = False
    decompression: bool = False


@dataclass(frozen=True)
class EventFilterSpec:
    """One `sink.filters.<name>` block (`EventFilterConfig`,
    configuration.go:147-151): an optional table selection, a
    boolean condition over the envelope, and the value the filter
    contributes when the condition does not resolve to a boolean.

    The reference compiles the condition with expr-lang
    (eventfilter.go:73); here the condition is a Spark SQL boolean
    expression over `key` and `value` structs, with the expr-lang
    surface operators (`&&`, `||`, `==`, `!`) translated."""

    name: str
    condition: str
    default_value: bool = True
    tables: TableSelection | None = None


@dataclass(frozen=True)
class EngineConfig:
    raw: dict = field(repr=False)
    connection: str = ""
    publication_name: str = ""
    publication_create: bool = True
    publication_autodrop: bool = True
    slot_name: str = ""
    slot_create: bool = True
    slot_autodrop: bool = True
    snapshot_batchsize: int = 1000
    snapshot_initial: str = "always"
    pg_tables: TableSelection = TableSelection()
    pg_events: EventFlags = EventFlags()
    hypertables: TableSelection = TableSelection()
    ts_events: EventFlags = EventFlags()
    sink_type: str = "stdout"
    sink_tombstone: bool = False
    sink_filters: tuple[EventFilterSpec, ...] = ()
    topic_prefix: str = "timescaledb"
    naming_strategy: str = "debezium"
    state_storage_type: str = "none"
    state_storage_path: str = ""


def _selection(raw: dict, prop: str) -> TableSelection:
    return TableSelection(
        includes=tuple(get_or_default(raw, f"{prop}.includes", [])),
        excludes=tuple(get_or_default(raw, f"{prop}.excludes", [])),
    )


def _events(raw: dict, prop: str, with_compression: bool) -> EventFlags:
    kwargs = {
        flag: bool(get_or_default(raw, f"{prop}.{flag}", default))
        for flag, default in (
            ("read", True),
            ("insert", True),
            ("update", True),
            ("delete", True),
            ("truncate", True),
            ("message", False),
        )
    }
    if with_compression:
        kwargs["compression"] = bool(
            get_or_default(raw, f"{prop}.compression", False)
        )
        kwargs["decompression"] = bool(
            get_or_default(raw, f"{prop}.decompression", False)
        )
    return EventFlags(**kwargs)


def _filters(raw: dict) -> tuple[EventFilterSpec, ...]:
    defs = get_or_default(raw, "sink.filters", {}) or {}
    specs = []
    for name in sorted(defs):
        d = defs[name] or {}
        tables = None
        if isinstance(d.get("tables"), dict):
            tables = TableSelection(
                includes=tuple(d["tables"].get("includes", []) or []),
                excludes=tuple(d["tables"].get("excludes", []) or []),
            )
        specs.append(
            EventFilterSpec(
                name=name,
                condition=str(d.get("condition", "")),
                default_value=bool(d.get("default", True)),
                tables=tables,
            )
        )
    return tuple(specs)


def load_config(path: str) -> EngineConfig:
    raw = load_raw(path)
    cfg = EngineConfig(
        raw=raw,
        connection=get_or_default(raw, "postgresql.connection", ""),
        publication_name=get_or_default(raw, "postgresql.publication.name", ""),
        publication_create=bool(
            get_or_default(raw, "postgresql.publication.create", True)
        ),
        publication_autodrop=bool(
            get_or_default(raw, "postgresql.publication.autodrop", True)
        ),
        slot_name=get_or_default(raw, "postgresql.replicationslot.name", ""),
        slot_create=bool(
            get_or_default(raw, "postgresql.replicationslot.create", True)
        ),
        slot_autodrop=bool(
            get_or_default(raw, "postgresql.replicationslot.autodrop", True)
        ),
        snapshot_batchsize=int(
            get_or_default(raw, "postgresql.snapshot.batchsize", 1000)
        ),
        snapshot_initial=get_or_default(
            raw, "postgresql.snapshot.initial", "always"
        ),
        pg_tables=_selection(raw, "postgresql.tables"),
        pg_events=_events(raw, "postgresql.events", with_compression=False),
        hypertables=_selection(raw, "timescaledb.hypertables"),
        ts_events=_events(raw, "timescaledb.events", with_compression=True),
        sink_type=get_or_default(raw, "sink.type", "stdout"),
        sink_tombstone=bool(get_or_default(raw, "sink.tombstone", False)),
        sink_filters=_filters(raw),
        topic_prefix=get_or_default(raw, "topic.prefix", "timescaledb"),
        naming_strategy=get_or_default(
            raw, "topic.namingstrategy.type", "debezium"
        ),
        state_storage_type=get_or_default(raw, "statestorage.type", "none"),
        state_storage_path=get_or_default(raw, "statestorage.file.path", ""),
    )
    _validate(cfg)
    return cfg


def _validate(cfg: EngineConfig) -> None:
    if cfg.sink_type not in SINK_TYPES:
        raise ValueError(f"unknown sink type {cfg.sink_type!r}")
    if cfg.naming_strategy not in NAMING_STRATEGY_TYPES:
        raise ValueError(f"unknown naming strategy {cfg.naming_strategy!r}")
    if cfg.snapshot_initial not in SNAPSHOT_MODES:
        raise ValueError(f"unknown initial snapshot mode {cfg.snapshot_initial!r}")
    if cfg.state_storage_type not in STATE_STORAGE_TYPES:
        raise ValueError(f"unknown state storage type {cfg.state_storage_type!r}")
    if cfg.state_storage_type == "file" and not cfg.state_storage_path:
        raise ValueError("statestorage.type = 'file' requires statestorage.file.path")


# ------------------------------------------------------------- assembly


def condition_to_sql(condition: str) -> str:
    """Translate a `sink.filters.*.condition` (expr-lang, the language
    the reference compiles in eventfilter.go:21-22) to Spark SQL via
    the recursive-descent translator in config_expr.py (r8): the
    surface operators (`&& || ! == != < <= > >=`), ternaries,
    `in [...]`, the string operators
    (startsWith/endsWith/contains/matches) and the plausible builtins
    (len/abs/lower/upper/trim/int/float/string) translate; ANYTHING
    else raises ExprTranslationError naming the construct — a
    condition can no longer parse-but-mean-something-different. String
    literals pass through verbatim (`value.name == "a&&b"` keeps its
    literal intact; both languages read backslash escapes the same
    way)."""
    from timescaledb_event_streamer_spark.config_expr import (
        translate_condition,
    )

    return translate_condition(condition)


class PipelineAssembly:
    """The wired pipeline a config file describes.

    `build(events)` is the reference's
    resolve -> wrap -> filter -> route chain (I3) with the config's
    hypertable filter, event-type flags, event filters, naming
    prefix and tombstone generation applied; `shape(env)` applies
    the configured sink's wire contract. Works identically on batch
    and streaming frames — every step is a column transform."""

    def __init__(self, cfg: EngineConfig):
        from timescaledb_event_streamer_spark.catalog.tablefilter import TableFilter

        self.config = cfg
        # replication filters are opt-in: a table must match an
        # include to replicate (systemcatalog.go:75-85 passes
        # acceptedByDefault=false to both filters)
        self.table_filter = TableFilter(
            includes=list(cfg.hypertables.includes),
            excludes=list(cfg.hypertables.excludes),
            accepted_by_default=False,
        )
        self.pg_table_filter = TableFilter(
            includes=list(cfg.pg_tables.includes),
            excludes=list(cfg.pg_tables.excludes),
            accepted_by_default=False,
        )

    # -- snapshot mode (replicationchannel.go:199-226) ------------------

    def include_initial_snapshot(self, has_offset: bool = False) -> bool:
        """Whether startup performs the initial snapshot: 'always'
        snapshots every start, 'never' never does, 'initial_only'
        only when no prior offset exists."""
        mode = self.config.snapshot_initial
        if mode == "always":
            return True
        if mode == "never":
            return False
        return not has_offset

    # -- op flags --------------------------------------------------------

    def _enabled_ops(self, flags: EventFlags | None = None) -> list[str]:
        if flags is None:
            flags = self.config.ts_events
        ops = []
        if flags.read:
            ops.append("r")
        if flags.insert:
            ops.append("c")
        if flags.update:
            ops.append("u")
        if flags.delete:
            ops.append("d")
        if flags.truncate:
            ops.append("t")
        if flags.message:
            ops.append("m")
        return ops

    # -- build -----------------------------------------------------------

    def build(
        self, events: DataFrame, table_class: str = "hypertable"
    ) -> DataFrame:
        """Assemble the configured pipeline for one replication
        stream. `table_class` picks which config section governs it,
        mirroring the reference's split resolution paths
        (replicationresolver.go routes hypertable relations through
        timescaledb.{hypertables,events} and vanilla relations
        through postgresql.{tables,events}): 'hypertable' applies
        the hypertable selection + ts event flags, 'postgresql' the
        plain-table selection + pg event flags."""
        from timescaledb_event_streamer_spark.streaming.pipelines import (
            filtered_routed,
        )

        if table_class == "hypertable":
            tf, flags = self.table_filter, self.config.ts_events
        elif table_class == "postgresql":
            tf, flags = self.pg_table_filter, self.config.pg_events
        else:
            raise ValueError(f"unknown table class {table_class!r}")
        env = filtered_routed(
            events, table_filter=tf, prefix=self.config.topic_prefix
        )
        env = env.filter(F.col("op").isin(self._enabled_ops(flags)))
        for spec in self.config.sink_filters:
            env = self._apply_event_filter(env, spec)
        env = env.withColumn("is_tombstone", F.lit(False))
        if self.config.sink_tombstone:
            # eventemitter delete+tombstone emission (A10): each
            # delete is followed by a key-only null-payload record
            # for log-compacted sinks
            tombs = (
                env.filter(F.col("op") == "d")
                .withColumn("op", F.lit(None).cast("string"))
                .withColumn("after_value", F.lit(None).cast("double"))
                .withColumn("after_props", F.lit(None).cast("string"))
                .withColumn("is_tombstone", F.lit(True))
            )
            env = env.unionByName(tombs)
        return env

    def _apply_event_filter(self, env: DataFrame, spec: EventFilterSpec) -> DataFrame:
        # eventfilter.go:104-117: a filter whose table selection does
        # not match contributes nothing; otherwise its condition must
        # hold (conjunctive across filters), with default_value
        # applied when the condition does not resolve to a boolean.
        # Two loud-reject layers: condition_to_sql refuses expr-lang
        # outside the translated subset at translate time, and the
        # F.expr parse below surfaces anything Spark's parser still
        # dislikes WITH the filter's name attached.
        sql = condition_to_sql(spec.condition)
        try:
            cond = F.expr(sql)
        except Exception as exc:  # pragma: no cover - parser-specific
            raise ValueError(
                f"sink filter condition {spec.condition!r} translated to "
                f"unparseable SQL {sql!r}: {exc}"
            ) from exc
        verdict = F.coalesce(cond, F.lit(spec.default_value))
        if spec.tables is not None:
            from timescaledb_event_streamer_spark.catalog.tablefilter import (
                TableFilter,
            )

            tf = TableFilter(
                includes=list(spec.tables.includes),
                excludes=list(spec.tables.excludes),
                accepted_by_default=True,
            )
            applies = tf.column(F.col("source_schema"), F.col("source_table"))
            verdict = F.when(applies, verdict).otherwise(F.lit(True))
        return env.filter(verdict)

    # -- sink shaping ------------------------------------------------------

    def shape(self, env: DataFrame) -> DataFrame:
        from timescaledb_event_streamer_spark.sinks import encoders, writers

        sink = self.config.sink_type
        if sink == "stdout":
            return env
        if sink == "kafka":
            return writers.kafka_shaped(env, key_cols=["key_user_id"])
        if sink == "nats":
            return encoders.nats_shaped(env, key_cols=["key_user_id"])
        if sink == "redis":
            return encoders.redis_shaped(env, key_cols=["key_user_id"])
        if sink == "kinesis":
            return encoders.kinesis_shaped(env)
        if sink == "sqs":
            return encoders.sqs_shaped(env)
        if sink == "http":
            url = get_or_default(self.config.raw, "sink.http.url", "")
            return encoders.http_shaped(env, url)
        raise ValueError(f"unknown sink type {sink!r}")  # pragma: no cover

    # -- sink delivery -----------------------------------------------------

    @staticmethod
    def _tls_opts(raw: dict, prefix: str) -> dict:
        """Shared sink-TLS property block (constants.go:72-74 /
        98-99 shape: <sink>.tls.{enabled,skipverify} + cert paths)."""
        if not get_or_default(raw, f"{prefix}.enabled", False):
            return {}
        return {
            "tls": True,
            "tls_opts": {
                "skip_verify": get_or_default(
                    raw, f"{prefix}.skipverify", False
                ),
                "cafile": get_or_default(raw, f"{prefix}.cafile", None),
                "certfile": get_or_default(raw, f"{prefix}.certfile", None),
                "keyfile": get_or_default(raw, f"{prefix}.keyfile", None),
            },
        }

    @staticmethod
    def _host_port(addr: str, default_port: int) -> tuple[str, int]:
        addr = addr.split("://", 1)[-1]
        host, _, port = addr.partition(":")
        return host, int(port) if port else default_port

    def deliver_batch(self, shaped: DataFrame) -> None:
        """Dispatch one (micro-)batch of `shape()` output to the REAL
        delivery loop for the configured sink (r9) — connection
        settings read with the reference's exact property names
        (spi/config/constants.go). stdout prints via the console
        path; every broker sink runs its executor-side loop."""
        raw = self.config.raw
        sink = self.config.sink_type
        if sink == "stdout":
            shaped.write.format("console").save()
            return
        if sink == "kafka":
            from timescaledb_event_streamer_spark.sinks.kafka_delivery import (
                kafka_sink_batch,
            )

            brokers = get_or_default(raw, "sink.kafka.brokers", [])
            if isinstance(brokers, str):
                brokers = [brokers]
            if not brokers:
                raise ValueError("sink.kafka.brokers is required")
            # one broker -> direct loop (static n_partitions); a
            # broker LIST -> metadata-driven cluster routing, the
            # reference's sarama posture (r11; replaces the r10 loud
            # refusal — see CONNECTOR.md migration notes)
            opts: dict = {}
            if get_or_default(raw, "sink.kafka.sasl.enabled", False):
                # kafka.go:54-66 / constants.go:68-71; sarama's
                # SASLTypePlaintext default
                opts["sasl_mechanism"] = get_or_default(
                    raw, "sink.kafka.sasl.mechanism", "PLAIN"
                )
                opts["sasl_username"] = get_or_default(
                    raw, "sink.kafka.sasl.user", ""
                )
                opts["sasl_password"] = get_or_default(
                    raw, "sink.kafka.sasl.password", ""
                )
            opts.update(self._tls_opts(raw, "sink.kafka.tls"))
            hostports = [self._host_port(b, 9092) for b in brokers]
            kafka_sink_batch(
                shaped,
                hostports if len(hostports) > 1 else hostports[0],
                **opts,
            )
            return
        if sink == "nats":
            from timescaledb_event_streamer_spark.sinks.nats_delivery import (
                nats_sink_batch,
            )

            addr = get_or_default(
                raw, "sink.nats.address", "nats://localhost:4222"
            )
            nats_sink_batch(
                shaped.withColumnRenamed("data", "envelope"),
                self._host_port(addr, 4222),
                authorization=get_or_default(
                    raw, "sink.nats.authorization", "userinfo"
                ),
                username=get_or_default(
                    raw, "sink.nats.userinfo.username", ""
                ),
                password=get_or_default(
                    raw, "sink.nats.userinfo.password", ""
                ),
                jwt=get_or_default(raw, "sink.nats.jwt.jwt", ""),
                seed=get_or_default(raw, "sink.nats.jwt.seed", ""),
                **self._tls_opts(raw, "sink.nats.tls"),
            )
            return
        if sink == "redis":
            from timescaledb_event_streamer_spark.sinks.redis_delivery import (
                redis_sink_batch,
            )

            addr = get_or_default(
                raw, "sink.redis.address", "localhost:6379"
            )
            redis_sink_batch(
                shaped,
                self._host_port(addr, 6379),
                password=get_or_default(raw, "sink.redis.password", ""),
                db=int(get_or_default(raw, "sink.redis.database", 0)),
                max_retries=int(
                    get_or_default(raw, "sink.redis.retries.maxattempts", 0)
                ),
                **self._tls_opts(raw, "sink.redis.tls"),
            )
            return
        if sink == "kinesis":
            from timescaledb_event_streamer_spark.sinks.aws_delivery import (
                kinesis_sink_batch,
            )

            kinesis_sink_batch(
                shaped,
                get_or_default(raw, "sink.kinesis.aws.endpoint", ""),
                get_or_default(raw, "sink.kinesis.stream.name", "events"),
                region=get_or_default(
                    raw, "sink.kinesis.aws.region", "us-east-1"
                ),
                access_key=get_or_default(
                    raw, "sink.kinesis.aws.accesskeyid", ""
                ),
                secret_key=get_or_default(
                    raw, "sink.kinesis.aws.secretaccesskey", ""
                ),
            )
            return
        if sink == "sqs":
            from timescaledb_event_streamer_spark.sinks.aws_delivery import (
                sqs_sink_batch,
            )

            sqs_sink_batch(
                shaped,
                get_or_default(raw, "sink.sqs.queue.url", ""),
                region=get_or_default(raw, "sink.sqs.aws.region", "us-east-1"),
                access_key=get_or_default(
                    raw, "sink.sqs.aws.accesskeyid", ""
                ),
                secret_key=get_or_default(
                    raw, "sink.sqs.aws.secretaccesskey", ""
                ),
            )
            return
        if sink == "http":
            from timescaledb_event_streamer_spark.sinks.http_delivery import (
                http_sink_batch,
                http_sink_headers,
            )

            http_sink_batch(
                # http_shaped carries (url, body); the delivery loop
                # posts the envelope column to the CONFIGURED url
                shaped.select(F.col("body").alias("envelope")),
                get_or_default(raw, "sink.http.url", ""),
                http_sink_headers(
                    get_or_default(
                        raw, "sink.http.authentication.type", "none"
                    ),
                    username=get_or_default(
                        raw, "sink.http.authentication.basic.username", ""
                    ),
                    password=get_or_default(
                        raw, "sink.http.authentication.basic.password", ""
                    ),
                    header_name=get_or_default(
                        raw, "sink.http.authentication.header.name", ""
                    ),
                    header_value=get_or_default(
                        raw, "sink.http.authentication.header.value", ""
                    ),
                ),
            )
            return
        raise ValueError(f"unknown sink type {sink!r}")  # pragma: no cover


def from_config(path: str) -> PipelineAssembly:
    """Parse a reference-format config file and return the wired
    pipeline assembly — the Spark counterpart of the reference's
    `internal/sysconfig` + stream manager startup."""
    return PipelineAssembly(load_config(path))
