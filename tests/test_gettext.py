"""gettext PO parsing (operators/gettext.py): quoted-run reassembly,
escapes, header drop, plural-form anchoring, flags, renumbering."""

from __future__ import annotations

from seaexplorertools_spark.operators.gettext import documents_as_po, po_entries

PO = '''msgid ""
msgstr ""
"Project-Id-Version: demo\\n"

#: src/main.c:42
#, fuzzy, c-format
msgid "Hello %s"
msgstr "Bonjour %s"

msgctxt "menu"
msgid ""
"Multi "
"line"
msgstr "Multiligne"

msgid "Escaped \\"quote\\" and\\nnewline"
msgstr ""

msgid "One file"
msgid_plural "%d files"
msgstr[0] "Un fichier"
msgstr[1] "%d fichiers"
'''


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, po_text string")
    return po_entries(df).orderBy("entry_idx").collect()


def test_po_entries(spark):
    rows = _run(spark, PO)
    assert len(rows) == 4  # header dropped
    a, b, c, d = rows
    assert a["msgid"] == "Hello %s" and a["msgstr"] == "Bonjour %s"
    assert a["fuzzy"] is True and a["translated"] is True
    assert a["msgctxt"] is None
    # multi-line reassembly + msgctxt
    assert b["msgid"] == "Multi line" and b["msgctxt"] == "menu"
    # escapes, untranslated
    assert c["msgid"] == 'Escaped "quote" and\nnewline'
    assert c["msgstr"] == "" and c["translated"] is False
    # plural entry: plain msgid extracted; msgstr[N] must NOT be
    # captured by the plain msgstr anchor
    assert d["msgid"] == "One file" and d["msgstr"] is None
    assert d["translated"] is False
    # renumbering is post-drop, 0-based
    assert [r["entry_idx"] for r in rows] == [0, 1, 2, 3]


def test_empty_catalog(spark):
    assert _run(spark, "") == []
    assert _run(spark, 'msgid ""\nmsgstr "hdr"') == []


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = po_entries(documents_as_po(docs))
    agg = out.agg(
        F.sum(F.col("fuzzy").cast("long")).alias("n_fuzzy"),
        F.sum((~F.col("translated")).cast("long")).alias("n_untr"),
        F.sum(F.col("msgctxt").isNotNull().cast("long")).alias("n_ctx"),
        F.sum(F.col("msgid").contains('"').cast("long")).alias("n_esc"),
    ).collect()[0]
    assert all(agg[k] > 0 for k in ["n_fuzzy", "n_untr", "n_ctx", "n_esc"])
