"""CQL trigger surface — the ITrigger contract, Spark-side.

Reference semantics (all file:line into /root/reference):

- ``triggers/ITrigger.java:41,49`` — a trigger is a stateless class with
  a no-arg constructor whose ``augment(Partition update)`` is called
  exactly once per partition update and returns additional mutations
  that are "atomically updated" with the primary write.
- ``triggers/TriggerExecutor.java:113-146`` — per mutation, per
  partition update, every trigger on the table runs; if ANY trigger
  generated mutations and the original mutations contain counter
  updates the whole write is rejected ("Counter mutations and trigger
  mutations cannot be applied together atomically."); otherwise the
  union (original + generated) applies as one logged batch.
- ``triggers/TriggerExecutor.java:167-202`` — on the CAS path
  (conditional statements) generated mutations must target the SAME
  table and partition key as the primary update
  ("Partition key of additional mutation does not match primary update
  key" / "table of additional mutation does not match primary update
  table").
- Generated mutations do NOT re-fire triggers (StorageProxy
  ``mutateWithTriggers`` applies the augmented collection directly).
- ``schema/TriggerMetadata.java:24-32`` — trigger metadata is a name
  plus the single supported option ``'class'``.

The reference loads trigger classes from jars dropped in the triggers
directory (``TriggerExecutor.java:59-66`` CustomClassLoader). The
Spark-side analog is a process-local registry of Python classes:
``register_trigger_class("AuditTrigger", cls)`` is the "drop a jar"
step, and CREATE TRIGGER validates the class resolves exactly like
``CreateTriggerStatement.java:71-78`` ("Trigger class '%s' couldn't be
loaded").

Augmented mutations are expressed as CQL statements ``(cql, params)``
— the engine's Mutation analog — executed through the same
coordinator, inside the primary statement's atomicity scope: any
failure (including the counter/CAS gates) rolls the ENTIRE write back.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from cassandra_pmem_spark.cql.parser import InvalidRequest


@dataclass(frozen=True)
class TriggerUpdate:
    """The ``augment()`` argument — the partition-update facts the
    reference exposes through ``Partition`` that a trigger can act on:
    which table, which partition, and the written rows.

    ``rows`` carries one dict per affected row: clustering values plus
    the regular cells this statement wrote (collection/UDT element
    writes appear under their column name; deletes contribute rows with
    only key columns). ``kind`` is 'write' or 'delete'.
    """

    keyspace: str | None
    table: str
    partition_key: dict[str, Any]
    rows: tuple[dict, ...]
    kind: str


class ITrigger:
    """Base class for trigger implementations (ITrigger.java:41).

    Subclasses must be constructible with no arguments (contract item 1
    in ITrigger.java's javadoc) and should be stateless (item 3).
    """

    def augment(self, update: TriggerUpdate) -> list[tuple[str, list]] | None:
        """Return additional mutations — ``(cql, params)`` statements —
        to apply atomically with the primary update, or None/[]."""
        raise NotImplementedError


# the "triggers directory" analog: registered Python trigger classes
_TRIGGER_CLASSES: dict[str, type] = {}
# one cached instance per class, like TriggerExecutor.cachedTriggers
_CACHED: dict[str, ITrigger] = {}


def register_trigger_class(name: str, cls: type) -> None:
    """Make a trigger class loadable by CREATE TRIGGER ... USING '<name>'
    (the analog of dropping a jar into the triggers directory)."""
    if not (isinstance(cls, type) and issubclass(cls, ITrigger)):
        raise TypeError(f"{cls!r} does not implement ITrigger")
    _TRIGGER_CLASSES[name] = cls
    _CACHED.pop(name, None)


def unregister_trigger_class(name: str) -> None:
    _TRIGGER_CLASSES.pop(name, None)
    _CACHED.pop(name, None)


def load_trigger_instance(class_name: str) -> ITrigger:
    """CreateTriggerStatement.java:71-78 / TriggerExecutor caching: the
    class must construct with no arguments; instances are cached per
    class name."""
    inst = _CACHED.get(class_name)
    if inst is None:
        cls = _TRIGGER_CLASSES.get(class_name)
        if cls is None:
            raise InvalidRequest(
                f"Trigger class '{class_name}' couldn't be loaded"
            )
        inst = cls()  # no-arg constructor, per the ITrigger contract
        _CACHED[class_name] = inst
    return inst


def trigger_class_exists(class_name: str) -> bool:
    return class_name in _TRIGGER_CLASSES


def partition_key_string(values: list[Any]) -> str:
    """The reference example renders the partition key via
    ``partitionKeyType.getString(...)`` (AuditTrigger.java:50) — single
    keys print their CQL literal text, composite keys join components
    with ':' (AbstractCompositeType.getString)."""
    return ":".join("" if v is None else str(v) for v in values)


class AuditTrigger(ITrigger):
    """The reference's shipped example trigger
    (``examples/triggers/src/.../AuditTrigger.java:34-53``): for every
    partition update, insert one audit row — (keyspace_name,
    table_name, primary_key-as-string) keyed by a fresh timeuuid — into
    a configured audit table.

    The reference configures keyspace/table via AuditTrigger.properties
    (default ``test.audit``); the analog reads class attributes, so a
    subclass is the "edited properties file". The timeuuid key is
    minted by the engine's now() fold (UUIDGen.getTimeUUID analog), so
    replays stay deterministic.
    """

    audit_keyspace: str = "test"
    audit_table: str = "audit"

    def augment(self, update: TriggerUpdate) -> list[tuple[str, list]]:
        pk = partition_key_string(list(update.partition_key.values()))
        return [
            (
                f"INSERT INTO {self.audit_keyspace}.{self.audit_table} "
                "(id, keyspace_name, table_name, primary_key) "
                "VALUES (now(), ?, ?, ?)",
                [update.keyspace or "", update.table, pk],
            )
        ]


register_trigger_class("AuditTrigger", AuditTrigger)
