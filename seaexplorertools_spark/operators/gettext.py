"""gettext PO catalog parsing — the parallel-corpus mining lane.

Translation memories ship as PO catalogs (the GNU gettext format —
public spec, gettext manual §3): blank-line-separated entries of
``msgid``/``msgstr`` pairs with optional ``msgctxt``, ``#,`` flag
comments, and multi-line strings as runs of adjacent quoted chunks.
Parallel text is prime LLM training data, so the prep pipeline wants
these exploded into (source, target) rows with the quality flags a
filter keys on (fuzzy, untranslated).

Fully codegen: split on blank lines + posexplode, then per-entry
keyword-anchored quoted-run extraction (``regexp_extract`` the run,
``regexp_extract_all`` the chunks, ``array_join`` the reassembly).
Zero shuffle, no Python.

Scope (documented): C-escape handling covers ``\\n`` and ``\\"`` (the
overwhelmingly common pair in UI strings); plural forms
(``msgstr[N]``) are not exploded — the plain msgstr extraction is
anchored so plural entries degrade to NULL rather than mis-pair. The
header entry (``msgid ""``) is dropped by convention.

Reference parity: no i18n path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
LLM-data surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# a keyword's quoted run: KEYWORD "chunk" "chunk" ... (whitespace/newline
# separated); chunks may contain escaped quotes
_RUN = r'((?:\s*"(?:[^"\\]|\\.)*")+)'
_CHUNK = r'"((?:[^"\\]|\\.)*)"'


def _quoted_value(entry: Column, keyword: str) -> Column:
    """Reassembled string value of ``keyword`` in the entry, or NULL
    when the keyword is absent ('' run never matches — a keyword is
    always followed by at least one quoted chunk)."""
    run = F.regexp_extract(entry, keyword + _RUN, 1)
    joined = F.array_join(
        F.transform(
            F.regexp_extract_all(run, F.lit(_CHUNK), F.lit(1)),
            _unescape,
        ),
        "",
    )
    return F.when(run != "", joined)


def _unescape(chunk: Column) -> Column:
    chunk = F.regexp_replace(chunk, r"\\n", "\n")
    return F.regexp_replace(chunk, r'\\"', '"')


def po_entries(df: DataFrame, key: str = "doc_id", po: str = "po_text") -> DataFrame:
    """Explode a PO catalog into one row per entry:
    (key, entry_idx, msgctxt, msgid, msgstr, fuzzy, translated).
    entry_idx counts surviving entries 0-based AFTER the header drop;
    ``fuzzy`` reads the ``#,`` flag comment; ``translated`` is the
    non-empty-msgstr quality gate."""
    blocks = F.split(F.col(po), r"\n\s*\n")
    exploded = df.select(key, F.posexplode(blocks).alias("raw_idx", "entry"))
    e = F.col("entry")
    msgid = _quoted_value(e, r"(?m)^msgid")
    msgstr = _quoted_value(e, r"(?m)^msgstr")
    msgctxt = _quoted_value(e, r"(?m)^msgctxt")
    fuzzy = e.rlike(r"(?m)^#,.*\bfuzzy")
    kept = (
        exploded.select(
            key,
            msgid.alias("msgid"),
            msgstr.alias("msgstr"),
            msgctxt.alias("msgctxt"),
            fuzzy.alias("fuzzy"),
            "raw_idx",
        )
        .filter(F.col("msgid").isNotNull() & (F.col("msgid") != ""))
    )
    w = F.row_number().over(Window.partitionBy(key).orderBy("raw_idx"))
    return kept.withColumn("entry_idx", (w - 1).cast("long")).select(
        key,
        "entry_idx",
        "msgctxt",
        "msgid",
        "msgstr",
        "fuzzy",
        (F.coalesce(F.col("msgstr"), F.lit("")) != "").alias("translated"),
    )


def documents_as_po(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL PO catalog — a header entry (msgid
    "" — must be dropped), then ``1 + doc_id % 3`` entries covering
    every branch closed-form: escaped quotes in the msgid on
    doc_id % 6 == 0 (entry 0), a MULTI-LINE msgid (empty first chunk +
    two continuation chunks) on entry 1, a msgctxt on entry 2, fuzzy
    flag when (doc_id + i) % 4 == 0, untranslated (empty msgstr) when
    (doc_id + i) % 5 == 0."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    header = F.lit(
        'msgid ""\nmsgstr ""\n"Project-Id-Version: x\\n"\n"Language: fr\\n"'
    )

    def entry(i: int):
        tag = F.concat(s(d), F.lit(f"-{i}"))
        if i == 0:
            mid = F.when(
                d % 6 == 0,
                F.concat(F.lit('msgid "Say \\"hi\\" '), tag, F.lit('"')),
            ).otherwise(F.concat(F.lit('msgid "Hello '), tag, F.lit('"')))
        elif i == 1:
            mid = F.concat(
                F.lit('msgid ""\n"Hello "\n"'), tag, F.lit('"')
            )
        else:
            mid = F.concat(
                F.lit('msgctxt "menu"\nmsgid "Hello '), tag, F.lit('"')
            )
        mstr = F.when(
            (d + F.lit(i)) % 5 == 0, F.lit('msgstr ""')
        ).otherwise(F.concat(F.lit('msgstr "Bonjour '), tag, F.lit('"')))
        flag = F.when(
            (d + F.lit(i)) % 4 == 0, F.lit("#, fuzzy\n")
        ).otherwise(F.lit(""))
        return F.concat(flag, mid, F.lit("\n"), mstr)

    k = 1 + d % 3
    po = F.concat_ws(
        "\n\n",
        header,
        entry(0),
        F.when(k >= 2, entry(1)).otherwise(F.lit("")),
        F.when(k >= 3, entry(2)).otherwise(F.lit("")),
    )
    return docs.select("doc_id", po.alias("po_text"))
