"""Person/node-side pipeline operators (SURVEY.md A6, A11, A14, A22).

Reference behavior re-expressed:
- A11 distinct persons: the reference's uMap concurrent hashmap
  (cmd/bulk/main.go:29-53) implements first-sighting dedup; here it is
  dropDuplicates -- a shuffle-based exact distinct that spills.
- A6 IsTroveUser: the reference issues one MySQL point lookup per
  unseen person (mysql.go:17-57); here it is ONE broadcast/shuffle
  semi-join for the whole set -- the single biggest algorithmic win of
  the rewrite (N round-trips -> 1 join).
- A7 shard routing (mysql.go:22-37): obsolete -- Spark sees one
  logical table; physically, repartitionByRange on the key is the
  moral equivalent.
- A14 find-or-create: left-anti of incoming ids vs existing persons,
  then union -- idempotent key upsert without a mutable store. uid
  assignment is a deterministic content hash (the reference lets
  Dgraph assign uids per blank node, dgraph.go:278-304; a hash keeps
  re-runs idempotent, which the reference only gets via
  find-before-create round-trips).
- A22 decimal id validation: big.Int parse-or-skip
  (cmd/bulk/main.go:288-292) -> cast to DECIMAL(38,0) + null filter.
  uint64 ids overflow LongType (2^64-1), hence decimal 38.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_person_ids(rel: DataFrame) -> DataFrame:
    """A11: every person id appearing on either side of the stream,
    exactly once. Explode both endpoint columns (narrow), then one
    shuffle dedup."""
    pid = F.explode(
        F.array(F.col("from_person_id"), F.col("to_person_id"))
    ).alias("person_id")
    return rel.select(pid).dropDuplicates(["person_id"])


def enrich_is_trove(person_ids: DataFrame, trove_user: DataFrame) -> DataFrame:
    """A6 as a flag column: left join against the `user` existence
    table (person_id_user), true iff a matching row exists.

    The trove/user dim is broadcast when small; at 100 TB both sides
    are large -> Catalyst picks a shuffled semi-ish join on the key.
    """
    t = trove_user.select("person_id_user").dropDuplicates(["person_id_user"])
    return person_ids.join(
        t, person_ids["person_id"] == t["person_id_user"], "left"
    ).select(
        "person_id",
        F.col("person_id_user").isNotNull().alias("is_trove_user"),
    )


def filter_is_trove(person_ids: DataFrame, trove_user: DataFrame) -> DataFrame:
    """A6 as existence filter: left SEMI join (no payload, dedup-free)."""
    return person_ids.join(
        trove_user,
        person_ids["person_id"] == trove_user["person_id_user"],
        "left_semi",
    )


def find_or_create_persons(incoming_ids: DataFrame, existing: DataFrame) -> DataFrame:
    """A14: idempotent node upsert. Returns the updated persons table:
    existing rows unchanged; unseen ids appended with empty name
    (reference creates persons with name "" -- dgraph.go:236-241).

    left_anti + unionByName is the set-oriented form of the
    reference's per-record find-or-create round-trips (etl.go:67-85).
    """
    created = (
        incoming_ids.select("person_id")
        .dropDuplicates(["person_id"])
        .join(existing.select("person_id"), "person_id", "left_anti")
        .withColumn("name", F.lit(""))
    )
    return existing.select("person_id", "name").unionByName(created)


def with_uid(persons: DataFrame) -> DataFrame:
    """Deterministic uid per person: content hash of the key. Stable
    across re-runs and partitionings (monotonically_increasing_id is
    not), so downstream edges can join on it idempotently."""
    return persons.withColumn(
        "uid", F.sha2(F.concat(F.lit("person:"), F.col("person_id")), 256)
    )


def validate_decimal_ids(df: DataFrame, col: str = "person_id") -> DataFrame:
    """A22: keep rows whose id parses as an unsigned decimal integer
    (reference skips rows big.Int can't parse). DECIMAL(38,0) covers
    the uint64 key space the reference shards at 2^63.

    Digits-only by REGEX first: a bare decimal try_cast would also
    accept (and silently rewrite) values the reference's base-10
    big.Int parser rejects -- '1.5' rounds to 2, '1e3' expands to
    1000, '-5' violates the unsigned contract. Those rows must be
    SKIPPED, not fabricated into colliding ids."""
    parsed = F.when(
        F.col(col).rlike("^[0-9]{1,38}$"),
        F.col(col).try_cast("decimal(38,0)"),
    )
    return df.filter(parsed.isNotNull()).withColumn(col + "_num", parsed)
