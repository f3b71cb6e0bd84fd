"""LaTeX extraction (operators/latex.py): stripping order, escaped
percent, environment drops, command collapse, counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.latex import (
    documents_as_latex,
    latex_extract,
)


def _run(spark, tex):
    df = spark.createDataFrame([(1, tex)], "doc_id long, tex_text string")
    return latex_extract(df).collect()[0]


def test_full_paper(spark):
    tex = (
        "\\documentclass{article}\n\\title{T}\n\\begin{document}\n"
        "% drop me\n"
        "\\section{Intro}\nBody with 50\\% rate and $e=mc^2$ math"
        "\\cite{x}.\n"
        "\\begin{equation}\ny\n\\end{equation}\n"
        "\\begin{figure}\n\\includegraphics{f.png}\n\\end{figure}\n"
        "\\emph{important} \\textbf{bold} \\footnote{note text} end.\n"
        "\\end{document}\n"
    )
    r = _run(spark, tex)
    assert r["title"] == "T"
    assert (r["n_sections"], r["n_cites"], r["n_equations"]) == (1, 1, 1)
    assert "drop me" not in r["text"]
    assert "e=mc^2" not in r["text"] and "includegraphics" not in r["text"]
    assert "50% rate" in r["text"]
    assert "important bold note text end." in r["text"]
    assert "Intro" in r["text"]


def test_starred_and_nested_sections(spark):
    tex = (
        "\\begin{document}\\section*{A}\\subsection{B}x\\end{document}"
    )
    r = _run(spark, tex)
    assert r["n_sections"] == 1  # \section* not counted (brace form only)
    assert "A" in r["text"] and "B" in r["text"]


def test_align_env_counts_and_drops(spark):
    tex = "\\begin{document}a\\begin{align}x&=1\\end{align}b\\end{document}"
    r = _run(spark, tex)
    assert r["n_equations"] == 1 and "x&=1" not in r["text"]
    assert "a" in r["text"] and "b" in r["text"]


def test_no_title_is_null(spark):
    assert _run(spark, "\\begin{document}hi\\end{document}")["title"] is None


def test_fixture_branches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = latex_extract(documents_as_latex(docs))
    agg = out.agg(
        F.countDistinct("n_sections").alias("ns"),
        F.countDistinct("n_equations").alias("ne"),
        F.sum(F.col("text").contains("\\").cast("long")).alias("n_bs"),
    ).collect()[0]
    assert agg["ns"] == 3 and agg["ne"] == 2 and agg["n_bs"] == 0


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, tex_text string")
    plan = latex_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
