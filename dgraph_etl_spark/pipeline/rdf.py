"""RDF N-Quads sink (SURVEY.md A18, A21): format triples as strings,
union the triple kinds, write as text.

Triple grammar mirrors the reference's bulk writer
(cmd/bulk/main.go:271-329):
    _:<team>  <team_id>        "<team>" .
    _:<team>  <has_member>     _:<person> .
    _:<person> <person_id>     "<person>" .
    _:<person> <is_trove_user> "<true|false>"^^<xs:boolean> .
    _:<src>   <has_connection> _:<dst> (score=<int>) .

The reference appends every goroutine's triples to one shared file
handle with no synchronization (an interleaving hazard,
cmd/bulk/main.go:168-212). Here the triple set is a DataFrame written
by df.write.text -- each task writes its own part file; the output is
defined as a SET of lines (Dgraph's bulk loader is order-insensitive),
which is also how the oracle compares it.

Scale: string formatting is whole-stage-codegen'd concat -- no UDFs;
the write parallelizes across partitions. For a single-file need,
coalesce(1) only at small scale; at 100 TB you want the part files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _blank(col: Column) -> Column:
    # NULL-safe: the reference decodes a missing JSON field into Go's
    # zero value ("" / 0) and formats it -- it never drops the triple.
    # A raw concat would instead null the WHOLE line (write.text then
    # emits a bare empty line and the triple vanishes).
    return F.concat(F.lit("_:"), F.coalesce(col, F.lit("")))


def team_triples(team_member: DataFrame) -> DataFrame:
    """<team_id> triples, one per distinct team (A18 createRDFTeam)."""
    teams = team_member.select("team_id").dropDuplicates(["team_id"])
    return teams.select(
        F.concat(
            _blank(F.col("team_id")),
            F.lit(' <team_id> "'),
            F.coalesce(F.col("team_id"), F.lit("")),
            F.lit('" .'),
        ).alias("value")
    )


def membership_triples(team_member: DataFrame) -> DataFrame:
    """<has_member> triples (A18 createRDFTeamMember)."""
    return team_member.select(
        F.concat(
            _blank(F.col("team_id")),
            F.lit(" <has_member> "),
            _blank(F.col("person_id")),
            F.lit(" ."),
        ).alias("value")
    )


def person_triples(persons_flagged: DataFrame) -> DataFrame:
    """<person_id> + <is_trove_user> triples per distinct person
    (A18 createRDFUser; A21 bool -> typed literal). Input columns:
    person_id, is_trove_user (bool)."""
    pid = F.col("person_id")
    flag = F.when(F.col("is_trove_user"), "true").otherwise("false")
    id_triple = F.concat(
        _blank(pid),
        F.lit(' <person_id> "'),
        F.coalesce(pid, F.lit("")),
        F.lit('" .'),
    )
    trove_triple = F.concat(
        _blank(pid),
        F.lit(' <is_trove_user> "'),
        flag,
        F.lit('"^^<xs:boolean> .'),
    )
    return persons_flagged.select(
        F.explode(F.array(id_triple, trove_triple)).alias("value")
    )


def edge_triples(edges: DataFrame) -> DataFrame:
    """<has_connection> triples with the score facet (A18
    createRDFRelationships). Scores in this domain are integral
    (int-typed in the reference, elastic.go:21-22), rendered %d."""
    return edges.select(
        F.concat(
            _blank(F.col("src")),
            F.lit(" <has_connection> "),
            _blank(F.col("dst")),
            F.lit(" (score="),
            # Go's json.Unmarshal decodes a missing stats field to the
            # int zero value: NULL score formats as 0, the edge stays.
            # ROUND before the bigint cast (mirrored in the oracle): a
            # fractional score would otherwise round in DuckDB's CAST
            # but truncate in Spark's -- the b64 hazard; exact today
            # because scores are int-derived, but the guard must be
            # structural, not a domain comment
            F.coalesce(
                F.round(F.col("score"), 0).cast("bigint"), F.lit(0)
            ).cast("string"),
            F.lit(") ."),
        ).alias("value")
    )


def all_triples(
    team_member: DataFrame, persons_flagged: DataFrame, edges: DataFrame
) -> DataFrame:
    """The full bulk-load triple set: union of the four kinds (B25)."""
    return (
        team_triples(team_member)
        .unionByName(membership_triples(team_member))
        .unionByName(person_triples(persons_flagged))
        .unionByName(edge_triples(edges))
    )


def write_rdf(triples: DataFrame, path: str, single_file: bool = False) -> None:
    """A18 sink: text write, one line per triple."""
    df = triples.coalesce(1) if single_file else triples
    df.write.mode("overwrite").text(path)
