"""Entity detection: frequency/casing/pattern scoring of candidates.

Reference (alma/extraction/entity_detector.py:401-728): capitalized
single words and multi-word proper nouns appearing >= 3 times become
candidates; signal patterns (dialogue markers, person verbs, project
verbs, versioned refs, code-file refs) classify each as person vs
project/tool.

Spark shape: regexp_extract_all + explode -> frequency groupBy (the
distributed part, scales with corpus size), then signal scoring as
conditional counts per candidate — one more aggregation, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_FREQUENCY = 3
_STOP = (
    "the a an this that these those i you he she it we they is are was were "
    "what when where why how yes no not and or but if then with for".split()
)

CAP_WORD = r"\b([A-Z][a-z]{1,19})\b"
MULTI_WORD = r"\b([A-Z][a-z]+(?: [A-Z][a-z]+)+)\b"
# name-adjacent signal patterns (reference: entity_detector.py
# DIALOGUE/PERSON_VERB/PROJECT_VERB pattern groups, _build_patterns)
_PERSON_AFTER = r"\s+(said|asked|wants|thinks|replied|mentioned)"
_PERSON_BEFORE = r"(?i)(hey|thanks|thank you|hi)\s+"
_PROJECT_AFTER = r"(?i)\s+(version|install|repo|release|build|deploy|docs)"
_PROJECT_VERSIONED = r"[-v]\d"


def detect_entities(
    docs: DataFrame,
    text_col: str = "text",
    min_frequency: int = MIN_FREQUENCY,
) -> DataFrame:
    """Candidates with frequency >= min_frequency, classified
    person/tool/concept by counting NAME-ADJACENT patterns (dialogue
    verbs and direct address -> person; version/install/build context ->
    tool). Two aggregations: candidate frequency, then one doc scan with
    the (broadcast) candidate set counting dynamic regex hits per name.
    Returns (name, frequency, person_signals, project_signals,
    entity_type)."""
    singles = F.regexp_extract_all(text_col, F.lit(CAP_WORD), 1)
    multis = F.regexp_extract_all(text_col, F.lit(MULTI_WORD), 1)
    cands = (
        docs.select(F.explode(F.concat(singles, multis)).alias("name"))
        .filter(~F.lower(F.col("name")).isin(_STOP) & (F.length("name") > 1))
        .groupBy("name")
        .agg(F.count("*").alias("frequency"))
        .filter(F.col("frequency") >= min_frequency)
    )
    ctx = docs.select(F.col(text_col).alias("_ctx")).crossJoin(F.broadcast(cands))
    person = F.regexp_count(
        "_ctx", F.concat(F.col("name"), F.lit(_PERSON_AFTER))
    ) + F.regexp_count("_ctx", F.concat(F.lit(_PERSON_BEFORE), F.col("name")))
    project = F.regexp_count(
        "_ctx", F.concat(F.col("name"), F.lit(_PROJECT_AFTER))
    ) + F.regexp_count("_ctx", F.concat(F.col("name"), F.lit(_PROJECT_VERSIONED)))
    scored = ctx.groupBy("name", "frequency").agg(
        F.sum(person).alias("person_signals"),
        F.sum(project).alias("project_signals"),
    )
    etype = (
        F.when(F.col("person_signals") > F.col("project_signals"), "person")
        .when(F.col("project_signals") > F.col("person_signals"), "tool")
        .otherwise("concept")
    )
    return scored.withColumn("entity_type", etype)


def extract_graph(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    entity_re: str = "[A-Z][a-z]+",
    relation_type: str = "RELATED_TO",
) -> tuple[DataFrame, DataFrame]:
    """Text -> property graph: the deterministic batch form of the
    reference's EntityExtractor (alma/graph/extraction.py:86-183). The
    reference prompts an LLM per text and parses (entities,
    relationships) JSON; that path stays env-gated like every LLM stage
    here, and the scalable default derives the same graph shape from
    sentence co-occurrence:

        sentence split -> per-sentence entity sets (pattern entities,
        entity_detector-style) -> unordered within-sentence pairs ->
        relationship rows with co-occurrence weight.

    Returns (entities, relationships):
        entities:      (name, frequency)
        relationships: (source, target, relation_type, weight, n_docs)
    with source < target (unordered pairs, deterministic orientation).

    Scale shape: two narrow explodes (sentence entity sets are tiny)
    and two map-side-combinable aggregations — no joins, no windows;
    the output feeds the graph store's vertices/edges tables
    (operators/graph.py) directly.
    """
    sents = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), "[.!?]")).alias("sent"),
    )
    ents = sents.select(
        "_doc",
        F.array_distinct(
            F.regexp_extract_all(F.col("sent"), F.lit(entity_re), 0)
        ).alias("es"),
    ).filter(F.size("es") > 0)
    entities = (
        ents.select(F.explode("es").alias("name"))
        .groupBy("name")
        .agg(F.count("*").alias("frequency"))
    )
    pairs = (
        ents.select("_doc", F.explode("es").alias("source"), "es")
        .select("_doc", "source", F.explode("es").alias("target"))
        .filter(F.col("source") < F.col("target"))
    )
    relationships = (
        pairs.groupBy("source", "target")
        .agg(
            F.count("*").alias("weight"),
            F.countDistinct("_doc").alias("n_docs"),
        )
        .withColumn("relation_type", F.lit(relation_type))
    )
    return entities, relationships
