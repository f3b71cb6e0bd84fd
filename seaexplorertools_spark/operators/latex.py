"""LaTeX text extraction — the scientific-paper ingest lane.

Paper corpora (arXiv-style) are LaTeX sources; the prep pipeline
wants the prose with structure counts, not the markup. This is a
codegen ``regexp_replace``/``regexp_extract`` chain (order matters and
is documented inline) — no Python worker, zero shuffle, the same
design call as the HTML/markdown lanes (operators/text.py,
operators/markup.py).

Extraction order:

1. comments dropped — ``%`` to end-of-line, EXCEPT escaped ``\\%``
   (negative lookbehind)
2. display/figure/table environments dropped wholesale
   (``\\begin{equation|align|figure|table}…\\end{…}``), counted first
3. inline math ``$…$`` dropped, ``\\cite{…}``/``\\ref{…}`` dropped
   (counted first)
4. sectioning + emphasis commands keep their argument
   (``\\section{X}`` → ``X`` + newline; ``\\emph``/``\\textbf``/
   ``\\textit`` → argument)
5. remaining ``\\command[opt]{arg}`` collapse to their argument once,
   bare ``\\command`` stripped, ``\\%``/``\\&``/``\\_`` unescaped

Scope (documented): one level of command nesting (regex, not a TeX
engine) — enough for prose extraction; deeply nested macro soup
degrades to partially-stripped text, never an error.

Reference parity: none (LLM-data surface the brief adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENV = r"(?s)\\begin\{(equation|align|figure|table)\*?\}.*?\\end\{\1\*?\}"


def latex_extract(df: DataFrame, key: str = "doc_id", tex: str = "tex_text") -> DataFrame:
    """(key, title, n_sections, n_cites, n_equations, text) per LaTeX
    document — NULL title when no ``\\title{…}``."""
    x = F.col(tex)
    # counts BEFORE stripping
    title = F.regexp_extract(x, r"\\title\{([^}]*)\}", 1)
    n_sections = F.size(
        F.regexp_extract_all(x, F.lit(r"\\(?:sub)*section\{"), F.lit(0))
    ).cast("long")
    n_cites = F.size(
        F.regexp_extract_all(x, F.lit(r"\\cite[tp]?\{"), F.lit(0))
    ).cast("long")
    n_equations = F.size(
        F.regexp_extract_all(
            x, F.lit(r"\\begin\{(?:equation|align)\*?\}"), F.lit(0)
        )
    ).cast("long")
    # 1. comments (not \%)
    t = F.regexp_replace(x, r"(?m)(?<!\\)%.*$", "")
    # 2. drop environments wholesale
    t = F.regexp_replace(t, _ENV, "")
    # preamble/document markers
    t = F.regexp_replace(t, r"(?s)^.*?\\begin\{document\}", "")
    t = F.regexp_replace(t, r"\\end\{document\}.*", "")
    # 3. inline math, cite/ref/label
    t = F.regexp_replace(t, r"\$[^$]*\$", "")
    t = F.regexp_replace(t, r"\\(?:cite[tp]?|ref|eqref|label)\{[^}]*\}", "")
    # 4. sectioning keeps its argument as a line
    t = F.regexp_replace(t, r"\\(?:sub)*section\*?\{([^}]*)\}", "\n$1\n")
    t = F.regexp_replace(t, r"\\(?:emph|textbf|textit|texttt)\{([^}]*)\}", "$1")
    # 5. generic one-level commands, then escapes, then whitespace
    t = F.regexp_replace(t, r"\\[A-Za-z]+(?:\[[^\]]*\])?\{([^{}]*)\}", "$1")
    t = F.regexp_replace(t, r"\\[A-Za-z]+\*?", "")
    t = F.regexp_replace(t, r"\\([%&_])", "$1")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.trim(F.regexp_replace(t, r"\n{2,}", "\n"))
    return df.select(
        key,
        F.when(title != "", title).alias("title"),
        n_sections.alias("n_sections"),
        n_cites.alias("n_cites"),
        n_equations.alias("n_equations"),
        t.alias("text"),
    )


def documents_as_latex(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL LaTeX source — preamble (must be
    dropped up to ``\\begin{document}``), a title, ``1 + doc_id % 3``
    sections carrying the document text, a comment line AND an escaped
    ``\\%``, an inline-math span, a cite, and an equation environment
    on doc_id % 2 == 0. Closed-form in (doc_id, text) for
    ``txt_latex_extract``."""
    d = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    s = lambda c: c.cast("string")  # noqa: E731

    def section(i: int):
        return F.concat(
            F.lit(f"\\section{{Part {i}}}\n"),
            t if i == 0 else F.concat(F.lit(f"More {i} of doc "), s(d)),
            F.lit(" cited\\cite{ref"), s(d % 40), F.lit("}.\n"),
        )

    k = 1 + d % 3
    eq = F.when(
        d % 2 == 0,
        F.lit("\\begin{equation}\nE = mc^2\n\\end{equation}\n"),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit(
            "\\documentclass{article}\n\\usepackage{amsmath}\n"
            "\\title{Study "
        ),
        s(d % 70),
        F.lit(
            "}\n\\begin{document}\n% a comment line\n"
        ),
        section(0),
        F.when(k >= 2, section(1)).otherwise(F.lit("")),
        F.when(k >= 3, section(2)).otherwise(F.lit("")),
        eq,
        F.lit("Rate is 100\\% with $x+y$ gap \\emph{noted}.\n\\end{document}"),
    )
    return docs.select("doc_id", body.alias("tex_text"))
