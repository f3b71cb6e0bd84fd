"""SQL dump ingest — mysqldump-style ``INSERT … VALUES`` extraction.

Large public corpora ship as SQL dumps (Wikipedia/Wikidata publish
exactly this): DDL prologue + multi-row ``INSERT INTO `t` VALUES
(…),(…);`` statements. The training pipeline wants the VALUE TUPLES as
rows, not the SQL. Fully codegen:

1. statements for the requested table via DOTALL
   ``regexp_extract_all`` (other tables and all DDL are ignored)
2. tuples: parenthesized groups whose quoted strings may contain
   ``''``/``\\'`` escaped quotes, commas and NOTHING ELSE paren-shaped
   (MySQL dumps never nest parens in literals it emits — documented
   scope)
3. fields: a quoted-string-or-bare-token alternation via
   ``regexp_extract_all``, then per-position typed projection with
   quote stripping + escape folding; ``NULL`` bare token → NULL

Zero shuffle, no Python. Callers give the column names; like the
xml/CSV lanes, everything lands as STRING and the caller casts.

Reference parity: none (web-ingest surface the brief adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a field: quoted string (with '' or \' escapes) OR a bare token
_FIELD = r"('(?:[^'\\]|\\.|'')*'|[^,]+)"


def sqldump_rows(
    df: DataFrame,
    table_name: str,
    columns: list[str],
    key: str = "doc_id",
    sql: str = "sql_text",
) -> DataFrame:
    """Explode INSERT tuples for ``table_name`` into one row per tuple:
    (key, stmt_idx, tuple_idx, <columns…> as strings; quoted values
    unquoted+unescaped, bare NULL → NULL)."""
    x = F.col(sql)
    stmts = F.regexp_extract_all(
        x,
        F.lit(
            rf"(?s)INSERT INTO `?{table_name}`?(?:\s*\([^)]*\))?\s+VALUES\s*(.*?);"
        ),
        F.lit(1),
    )
    by_stmt = df.select(key, F.posexplode(stmts).alias("stmt_idx", "body"))
    tuples = F.regexp_extract_all(
        F.col("body"),
        F.lit(r"\(((?:'(?:[^'\\]|\\.|'')*'|[^()'])*)\)"),
        F.lit(1),
    )
    by_tuple = by_stmt.select(
        key,
        F.col("stmt_idx").cast("long").alias("stmt_idx"),
        F.posexplode(tuples).alias("tuple_idx", "tup"),
    )
    fields = F.regexp_extract_all(F.col("tup"), F.lit(_FIELD), F.lit(1))

    def col_at(i: int):
        raw = F.trim(fields.getItem(i))
        quoted = raw.rlike("^'.*'$")
        inner = F.regexp_extract(raw, "^'(.*)'$", 1)
        inner = F.regexp_replace(inner, "''", "'")
        inner = F.regexp_replace(inner, r"\\'", "'")
        inner = F.regexp_replace(inner, r"\\\\", r"\\")
        return (
            F.when(quoted, inner)
            .when(raw == "NULL", F.lit(None))
            .otherwise(raw)
        )

    return by_tuple.select(
        key,
        "stmt_idx",
        F.col("tuple_idx").cast("long").alias("tuple_idx"),
        *[col_at(i).alias(c) for i, c in enumerate(columns)],
    )


def documents_as_sqldump(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL dump — DDL prologue (must be
    ignored), an INSERT for a DECOY table (must be ignored), then
    ``1 + doc_id % 2`` INSERT statements for `page` with ``2 +
    doc_id % 2`` tuples each: (id, title, score, flags) where the
    title embeds an ``''``-escaped quote on doc_id % 6 == 0, score is
    dyadic, flags is NULL on odd tuple index. Closed-form in doc_id
    for ``mm_sqldump_rows``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    def tup(stmt: int, i: int):
        rid = d * 100 + stmt * 10 + i
        title = F.when(
            d % 6 == 0,
            F.concat(F.lit("it''s page "), s(d % 40)),
        ).otherwise(F.concat(F.lit("page "), s(d % 40)))
        flags = F.lit("NULL") if i % 2 == 1 else s(d % 8)
        return F.concat(
            F.lit("("), s(rid), F.lit(",'"), title, F.lit("',"),
            s(d % 9), F.lit(".25,"), flags, F.lit(")"),
        )

    def stmt(n: int):
        tuples = [tup(n, i) for i in range(4)]
        body = F.concat(
            tuples[0], F.lit(","), tuples[1],
            F.when(d % 2 == 1, F.concat(F.lit(","), tuples[2])).otherwise(
                F.lit("")
            ),
        )
        return F.concat(
            F.lit("INSERT INTO `page` VALUES "), body, F.lit(";\n")
        )

    prologue = F.lit(
        "-- MySQL dump\nDROP TABLE IF EXISTS `page`;\n"
        "CREATE TABLE `page` (id int, title text, score double, flags int);\n"
        "INSERT INTO `decoy` VALUES (9,'x',0.0,1);\n"
    )
    body = F.concat(
        prologue,
        stmt(0),
        F.when(d % 2 == 1, stmt(1)).otherwise(F.lit("")),
    )
    return docs.select("doc_id", body.alias("sql_text"))
